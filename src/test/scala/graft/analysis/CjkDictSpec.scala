package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Dictionary longest-match CJK segmentation + the round-4 advice fixes to
  * the bigram filter (position-gap preservation, full script set). */
class CjkDictSpec extends AnyFunSuite {
  private val dict = Set("数据流", "处理", "键值对")

  private def terms(an: Analyzer, text: String): List[(String, Int)] =
    an.analyze(text).map(t => (t.term, t.position)).toList

  test("dict words win; OOV tails fall back to bigrams") {
    val an = Analyzers.cjkDict(dict)
    assert(terms(an, "数据流处理") == List(("数据流", 0), ("处理", 1)))
    assert(terms(an, "键值对存储器") ==
      List(("键值对", 0), ("存储", 1), ("储器", 2)))
    // lone OOV char stays a unigram
    assert(terms(an, "键值对存") == List(("键值对", 0), ("存", 1)))
  }

  test("greedy longest match from each position") {
    val an = Analyzers.cjkDict(Set("数据", "数据流"))
    assert(terms(an, "数据流") == List(("数据流", 0)))
  }

  test("runs do not bridge whitespace; ascii passes through") {
    val an = Analyzers.cjkDict(dict)
    assert(terms(an, "a 数据流处理 b 键值对存储器") ==
      List(("a", 0), ("数据流", 1), ("处理", 2), ("b", 3),
        ("键值对", 4), ("存储", 5), ("储器", 6)))
    // adjacent runs ACROSS a space stay separate runs (offset gap), but
    // positions remain contiguous
    assert(terms(an, "数据流处理 键值对存储器") ==
      List(("数据流", 0), ("处理", 1), ("键值对", 2), ("存储", 3), ("储器", 4)))
  }

  test("cjkBigrams preserves pass-through position gaps (stop filtering)") {
    val an = Analyzer(stopWords = Set("the"), cjkBigram = true)
    // 'the' leaves a gap at position 1; the gap must survive the filter
    assert(terms(an, "big the 数据流 end") ==
      List(("big", 0), ("数据", 2), ("据流", 3), ("end", 4)))
  }

  test("bigram filter handles katakana and hangul runs") {
    val an = Analyzers.cjk
    assert(terms(an, "カタカナ").map(_._1) == List("カタ", "タカ", "カナ"))
    assert(terms(an, "한국어").map(_._1) == List("한국", "국어"))
  }
}
