package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestProps.{forAllN, forAllN2}
import org.scalacheck.Gen
import graft.codec.SmallFloat

class Bm25Spec extends AnyFunSuite {

  test("golden float scores (computed externally with IEEE float32 emulation of BM25Similarity.java:222-235)") {
    def score(freq: Int, normByte: Int, df: Long, n: Long, sumTtf: Long): Float = {
      val s = Bm25.scorer(1.0f, Bm25.DEFAULT_K1, Bm25.DEFAULT_B, df, CollectionStats(n, sumTtf))
      s.score(freq.toFloat, normByte)
    }
    assert(score(3, SmallFloat.intToByte4(10) & 0xFF, 10, 100, 800) == 1.5347426f)
    assert(score(1, SmallFloat.intToByte4(5) & 0xFF, 1, 100, 800) == 2.2602177f)
    assert(score(7, SmallFloat.intToByte4(50) & 0xFF, 90, 100, 800) == 0.05945026f)
    assert(score(2, SmallFloat.intToByte4(0) & 0xFF, 10, 100, 800) == 1.9684741f)
    assert(score(100, SmallFloat.intToByte4(1000) & 0xFF, 500, 10000, 2000000) == 2.8596294f)
  }

  test("golden idf and avgdl") {
    assert(Bm25.idf(10, 100) == 2.2637453f)
    assert(CollectionStats(100, 800).avgdl == 8.0f)
  }

  test("score is monotonic in freq (BaseSimilarityTestCase.testRandomScoring property)") {
    val stats = CollectionStats(1000, 50000)
    val s = Bm25.scorer(1.0f, Bm25.DEFAULT_K1, Bm25.DEFAULT_B, 37, stats)
    forAllN2(Gen.chooseNum(1, 100000), Gen.chooseNum(0, 255)) { (freq, norm) =>
      val a = s.score(freq.toFloat, norm)
      val b = s.score((freq + 1).toFloat, norm)
      assert(b >= a)
      assert(a >= 0f && java.lang.Float.isFinite(a))
      assert(a <= s.maxScore)
    }
  }

  test("score decreases (weakly) as doc length grows") {
    val stats = CollectionStats(1000, 50000)
    val s = Bm25.scorer(1.0f, Bm25.DEFAULT_K1, Bm25.DEFAULT_B, 37, stats)
    var prev = Float.MaxValue
    // norm bytes in unsigned order = increasing decoded length
    for (nb <- 0 until 256) {
      val sc = s.score(3f, nb)
      assert(sc <= prev)
      prev = sc
    }
  }

  test("idf decreases with docFreq; rare terms weigh more") {
    var prev = Float.MaxValue
    for (df <- 1L to 100L) {
      val v = Bm25.idf(df, 100)
      assert(v < prev); assert(v >= 0f)
      prev = v
    }
  }

  test("multi-term scorer sums idfs in double (BM25Similarity idfExplain :172-181)") {
    val stats = CollectionStats(100, 800)
    val m = Bm25.multiTermScorer(1.0f, 1.2f, 0.75f, Seq(10L, 20L), stats)
    val expected = (math.log(1 + (100 - 10 + 0.5) / 10.5) + math.log(1 + (100 - 20 + 0.5) / 20.5)).toFloat
    assert(m.weight == expected)
  }

  test("boost scales weight linearly") {
    val stats = CollectionStats(100, 800)
    val s1 = Bm25.scorer(1.0f, 1.2f, 0.75f, 10, stats)
    val s2 = Bm25.scorer(2.0f, 1.2f, 0.75f, 10, stats)
    assert(s2.weight == 2.0f * Bm25.idf(10, 100))
    assert(s2.score(3f, 10) > s1.score(3f, 10))
  }
}
