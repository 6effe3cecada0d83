package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived vectors for the Snowball German stemmer and the minimal
  * French stemmer — each traced on paper from the published algorithms,
  * independent of the implementation. */
class LangStemmerSpec extends AnyFunSuite {

  test("german: flexion suffixes (step 1) + umlaut postlude") {
    assert(GermanStemmer.stem("häusern") == "haus") // ern in R1, ä→a
    assert(GermanStemmer.stem("hauses") == "haus") // es in R1
    assert(GermanStemmer.stem("kategorien") == "kategori") // en in R1
    assert(GermanStemmer.stem("ergebnisse") == "ergebnis") // e + niss undouble
    assert(GermanStemmer.stem("haus") == "haus") // s not in R1
    assert(GermanStemmer.stem("fast") == "fast") // st not fully in R1
    assert(GermanStemmer.stem("stream") == "stream") // em before R1
  }

  test("german: verb endings (step 2) stack after step 1") {
    assert(GermanStemmer.stem("wanderer") == "wand") // er (step1) + er (step2)
  }

  test("german: d-suffixes (step 3)") {
    assert(GermanStemmer.stem("wanderung") == "wander") // ung in R2
    assert(GermanStemmer.stem("wanderungen") == "wander") // en then ung
    assert(GermanStemmer.stem("freundlichkeit") == "freundlich") // keit in R2; lich NOT in R2
  }

  test("german: R1 floor of 3 protects short words") {
    assert(GermanStemmer.stem("order") == "ord") // natural R1=2 floored to 3; er deleted
    assert(GermanStemmer.stem("the") == "the")
    assert(GermanStemmer.stem("agg") == "agg")
  }

  test("german: corpus vocabulary fixed points") {
    for (w <- Seq("batch", "big", "column", "data", "dup", "group", "hash",
      "join", "key", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "vector", "window"))
      assert(GermanStemmer.stem(w) == w, w)
    assert(GermanStemmer.stem("customer") == "custom")
    assert(GermanStemmer.stem("filter") == "filt")
    assert(GermanStemmer.stem("line") == "lin")
    assert(GermanStemmer.stem("merge") == "merg")
    assert(GermanStemmer.stem("table") == "tabl")
    assert(GermanStemmer.stem("value") == "valu")
  }

  test("french minimal: cascade + aux rule + length guard") {
    assert(Analyzer.minimalStemFr("chevaux") == "cheval") // aux → al
    assert(Analyzer.minimalStemFr("portes") == "port") // s then e
    assert(Analyzer.minimalStemFr("porter") == "port") // r then e
    assert(Analyzer.minimalStemFr("données") == "don") // s, e, é, undouble
    assert(Analyzer.minimalStemFr("donner") == "don")
    assert(Analyzer.minimalStemFr("cheval") == "cheval") // no suffix
    assert(Analyzer.minimalStemFr("table") == "table") // < 6 letters untouched
    assert(Analyzer.minimalStemFr("customer") == "custom")
    assert(Analyzer.minimalStemFr("vector") == "vecto")
    assert(Analyzer.minimalStemFr("stream") == "stream")
  }
}
