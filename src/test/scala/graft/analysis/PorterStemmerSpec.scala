package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Full-algorithm vectors hand-derived from the 1980 paper's per-step
  * examples (each paper example is carried through the REMAINING steps by
  * hand — e.g. the paper's step-1b "agreed→agree" finishes as "agre" after
  * step 5a). Includes the paper's two flagship end-to-end examples
  * (GENERALIZATIONS→GENER, OSCILLATORS→OSCIL) and the whole closed corpus
  * vocabulary the `ft_porter_*` oracle maps by hand. */
class PorterStemmerSpec extends AnyFunSuite {

  private def s(w: String): String = PorterStemmer.stem(w)

  test("step 1a: plural stripping") {
    assert(s("caresses") == "caress")
    assert(s("ponies") == "poni")
    assert(s("ties") == "ti")
    assert(s("caress") == "caress")
    assert(s("cats") == "cat")
  }

  test("step 1b: ed/ing with cleanup") {
    assert(s("feed") == "feed")       // eed with m=0 stays
    assert(s("agreed") == "agre")     // eed->ee, then 5a drops the e
    assert(s("plastered") == "plaster")
    assert(s("bled") == "bled")       // no vowel in stem 'bl'
    assert(s("motoring") == "motor")
    assert(s("sing") == "sing")       // no vowel in stem 's'
    assert(s("conflated") == "conflat") // at->ate, 5a drops (m=2)
    assert(s("troubled") == "troubl")   // bl->ble, 5a drops
    assert(s("sized") == "size")        // iz->ize, 5a keeps (*o)
    assert(s("hopping") == "hop")       // un-double pp
    assert(s("tanned") == "tan")
    assert(s("falling") == "fall")      // ll kept (ends l)
    assert(s("hissing") == "hiss")      // ss kept
    assert(s("fizzed") == "fizz")       // zz kept
    assert(s("failing") == "fail")
    assert(s("filing") == "file")       // m=1 and *o -> +e
  }

  test("step 1c: y->i") {
    assert(s("happy") == "happi")
    assert(s("sky") == "sky") // no vowel in stem 'sk'
  }

  test("step 2 suffix mapping carried to completion") {
    assert(s("relational") == "relat")
    assert(s("conditional") == "condit")
    assert(s("rational") == "ration")
    assert(s("valenci") == "valenc")
    assert(s("hesitanci") == "hesit")   // anci->ance, step4 drops ance
    assert(s("digitizer") == "digit")
    assert(s("conformabli") == "conform") // bli->ble (departure), step4
    assert(s("radicalli") == "radic")     // alli->al, step3 ical->ic
    assert(s("differentli") == "differ")  // entli->ent, step4 drops ent
    assert(s("vileli") == "vile")         // eli->e
    assert(s("analogousli") == "analog")
    assert(s("vietnamization") == "vietnam")
    assert(s("predication") == "predic")  // ation->ate, step4
    assert(s("operator") == "oper")
    assert(s("feudalism") == "feudal")
    assert(s("decisiveness") == "decis")
    assert(s("hopefulness") == "hope")
    assert(s("callousness") == "callous")
    assert(s("formaliti") == "formal")
    assert(s("sensitiviti") == "sensit")
    assert(s("sensibiliti") == "sensibl")
    assert(s("archaeologi") == "archaeolog") // logi->log (departure)
    assert(s("geologi") == "geologi") // stem 'geo' has m=0 -> rule gated off
  }

  test("step 3") {
    assert(s("triplicate") == "triplic")
    assert(s("formative") == "form")
    assert(s("formalize") == "formal")
    assert(s("electriciti") == "electr") // iciti->ic, step4 drops ic
    assert(s("electrical") == "electr")
    assert(s("hopeful") == "hope")
    assert(s("goodness") == "good")
  }

  test("step 4: residual suffixes at m>1") {
    assert(s("revival") == "reviv")
    assert(s("allowance") == "allow")
    assert(s("inference") == "infer")
    assert(s("airliner") == "airlin")
    assert(s("gyroscopic") == "gyroscop")
    assert(s("adjustable") == "adjust")
    assert(s("defensible") == "defens")
    assert(s("irritant") == "irrit")
    assert(s("replacement") == "replac")
    assert(s("adjustment") == "adjust")
    assert(s("dependent") == "depend")
    assert(s("adoption") == "adopt")    // ion only after s/t
    assert(s("communism") == "commun")
    assert(s("activate") == "activ")
    assert(s("angulariti") == "angular")
    assert(s("homologous") == "homolog")
    assert(s("effective") == "effect")
    assert(s("bowdlerize") == "bowdler")
  }

  test("step 5: final e and double l") {
    assert(s("probate") == "probat")
    assert(s("rate") == "rate")     // m=1 and *o keeps the e
    assert(s("cease") == "ceas")
    assert(s("controll") == "control")
    assert(s("roll") == "roll")     // m=1 keeps ll
  }

  test("paper flagship end-to-end examples") {
    assert(s("generalizations") == "gener")
    assert(s("oscillators") == "oscil")
    assert(s("connections") == "connect")
    assert(s("connected") == "connect")
    assert(s("connecting") == "connect")
    assert(s("connection") == "connect")
  }

  test("length <= 2 early-out") {
    assert(s("a") == "a")
    assert(s("is") == "is")
    assert(s("as") == "as")
  }

  test("the ft_porter_* oracle's hand-derived corpus vocabulary map") {
    // words the oracle CASE maps
    assert(s("customer") == "custom")
    assert(s("table") == "tabl")
    assert(s("value") == "valu")
    assert(s("key") == "kei")
    assert(s("queries") == "queri")
    assert(s("relational") == "relat")
    assert(s("generalizations") == "gener")
    assert(s("oscillating") == "oscil")
    assert(s("windowing") == "window")
    assert(s("happiness") == "happi")
    // words the oracle's ELSE arm leaves unchanged
    for (w <- Seq("join", "hash", "row", "batch", "scan", "column", "small",
        "order", "vector", "line", "data", "agg", "stream", "spark", "group",
        "part", "big", "dup", "fast", "slow", "merge", "the"))
      if (w == "merge") assert(s(w) == "merg") // replaced away pre-index
      else if (w == "slow") assert(s(w) == "slow")
      else assert(s(w) == w, s"expected '$w' unchanged")
  }

  test("query-side stems used by ft_porter_search / ft_porter_match") {
    assert(s("relates") == "relat")
    assert(s("oscillator") == "oscil")
    assert(s("generalize") == "gener")
  }
}
