package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** ICUFoldingFilter-analog chain (Analyzer.foldIcu) + the WB4 Extend
  * tokenizer rule it depends on for decomposed input. */
class IcuFoldSpec extends AnyFunSuite {

  test("foldIcu: width folding (NFKC) + case fold + accent strip") {
    assert(Analyzer.foldIcu("Ｔāblé") == "table") // fullwidth + macron + acute
    assert(Analyzer.foldIcu("ＶÉCTÖR".toLowerCase) == "vector")
    assert(Analyzer.foldIcu("ＶÉCTÖR") == "vector") // fold handles case itself
    assert(Analyzer.foldIcu("ﬁlter") == "filter") // fi ligature via NFKC
    assert(Analyzer.foldIcu("indeX́") == "index") // decomposed acute
    assert(Analyzer.foldIcu("Straße") == "strasse") // ß special
    assert(Analyzer.foldIcu("already-ascii") == "already-ascii")
  }

  test("foldIcu is idempotent") {
    for (s <- Seq("Ｔāblé", "ﬁlter", "ÇØDÉ", "indeX́")) {
      val once = Analyzer.foldIcu(s)
      assert(Analyzer.foldIcu(once) == once, s)
    }
  }

  test("tokenizer WB4: combining marks extend a run instead of breaking it") {
    val toks = Tokenizer.tokenize("indeX́ done").map(_.term).toList
    assert(toks == List("indeX́", "done"))
    // precomposed and decomposed tokenize to the same shape after folding
    val a = Tokenizer.tokenize("café").map(t => Analyzer.foldIcu(t.term)).toList
    val b = Tokenizer.tokenize("café").map(t => Analyzer.foldIcu(t.term)).toList
    assert(a == List("cafe") && a == b)
  }

  test("icu analyzer chain folds at index-token level") {
    val an = Analyzers.icu
    val (byTerm, len) = an.invert("Ｔāblé joins ＶÉCTÖR the indeX́")
    assert(byTerm.keySet == Set("table", "joins", "vector", "the", "index"))
    assert(len == 5)
  }
}
