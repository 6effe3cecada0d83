package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fixtures.CodeCorpus
import graft.index._

/** TotalHits + relation semantics (`TopScoreDocCollector` /
  * `TotalHits.Relation`, reference:
  * lucene/core/src/java/org/apache/lucene/search/TotalHits.java,
  * TopScoreDocCollector.java:51-340): the collector counts every match it
  * observes; once a partition has counted `totalHitsThreshold` matches it
  * may prune (MaxScore essential-list shrink, block-max skips), after which
  * the count is a lower bound — relation GTE_OR_EQUAL_TO. Below the
  * threshold no pruning ever engages, so the count is exact (EQUAL_TO). */
class TotalHitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val files = CodeCorpus.files(500)
  private lazy val index = IndexBuilder.build(
    spark.createDataset(files)(org.apache.spark.sql.Encoders.product[CodeFile]),
    IndexConfig(numPartitions = 4, saltSpan = 128))
  private lazy val searcher = new GraftSearcher(index)

  private def exactCount(q: String): Long =
    searcher.matchesDS(searcher.parse(q)).count()

  private val qs = Seq("return", "parsequery OR mergepolicy", "if AND return")

  test("unlimited threshold: relation EQ and exact counts on every query shape") {
    for (q <- qs) {
      val (hits, total, rel) = searcher.searchWithTotal(searcher.parse(q), 5, Long.MaxValue)
      assert(rel == "EQ", s"query: $q")
      assert(total == exactCount(q), s"query: $q")
      assert(hits.toSeq == searcher.search(searcher.parse(q), 5).toSeq, s"query: $q")
    }
  }

  test("default 1000 threshold on a small corpus stays exact (never counted enough)") {
    for (q <- qs) {
      val (_, total, rel) = searcher.searchWithTotal(searcher.parse(q), 5)
      assert(rel == "EQ", s"query: $q")
      assert(total == exactCount(q), s"query: $q")
    }
  }

  test("low threshold: pruning engages, count is a GTE lower bound, ranking unchanged") {
    for (q <- Seq("return", "parsequery OR mergepolicy")) {
      val exact = exactCount(q)
      val k = 3
      val (hits, total, rel) = searcher.searchWithTotal(searcher.parse(q), k, 1)
      assert(exact > k, s"fixture must have more than k matches for: $q")
      // sound lower bound, and at least the collected hits were counted
      assert(total <= exact, s"query: $q")
      assert(total >= k, s"query: $q")
      if (rel == "EQ") assert(total == exact, s"EQ must mean exact: $q")
      // pruned top-k is still rank- and score-identical
      assert(hits.toSeq == searcher.bruteForce(searcher.parse(q), k).toSeq, s"query: $q")
    }
  }

  test("MatchNone reports zero EQ") {
    val (hits, total, rel) = searcher.searchWithTotal(MatchNoneQ, 5)
    assert(hits.isEmpty && total == 0L && rel == "EQ")
  }

  test("zero-boost clauses cannot score but their matches still count (Lucene counts boost-0 hits)") {
    val q = BoolQ(should = Seq(
      BoostQ(TermQ("return"), 0f), TermQ("mergepolicy")))
    val (_, total, rel) = searcher.searchWithTotal(q, 5, Long.MaxValue)
    assert(rel == "EQ")
    assert(total == exactCount("return OR mergepolicy"))
  }
}
