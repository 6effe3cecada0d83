package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fixtures.CodeCorpus
import graft.analysis.Analyzers
import graft.search.{GraftSearcher, TermQ}

/** Index sorting (`IndexWriterConfig.setIndexSort`) + early-terminating
  * sorted collection (`TopFieldCollector.canEarlyTerminate`, reference:
  * lucene/core/src/java/org/apache/lucene/search/TopFieldCollector.java:212-227). */
class IndexSortSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 1500
  private lazy val corpus = CodeCorpus.files(N)
  private lazy val sortedIndex = IndexBuilder.build(
    spark.createDataset(corpus),
    IndexConfig(analyzer = Analyzers.simple, numPartitions = 4, sortFields = Seq("lang")))
  private lazy val searcher = new GraftSearcher(sortedIndex, Analyzers.simple)

  test("sorted build: docId order equals (lang, repo, path, commit) order") {
    assert(sortedIndex.indexSort == Seq("lang"))
    val docs = sortedIndex.docs.collect().sortBy(_.docId)
    val keys = docs.map(d => (d.lang, d.repo, d.path, d.commit)).toSeq
    assert(keys == keys.sorted)
    assert(docs.map(_.docId).toSeq == (0L until N.toLong))
  }

  test("searchByIndexOrder returns the sort-smallest matches") {
    val all = searcher.matchesDS(TermQ("indexwriter")).collect().sorted
    assert(all.length > 50)
    val et = searcher.searchByIndexOrder(TermQ("indexwriter"), 10).collect()
    // single sorted run: docId asc IS the index sort, so the global answer
    // is simply the 10 smallest matching docIds
    assert(et.sorted.take(10).toSeq == all.take(10).toSeq)
  }

  test("early termination decodes fewer blocks than exhaustive iteration") {
    val c = searcher.counters
    val q = TermQ("if") // Zipf head: matches most docs, many blocks
    val before1 = c.decoded.value
    searcher.matchesDS(q, numPartitions = 2).collect()
    val fullDecodes = c.decoded.value - before1
    val before2 = c.decoded.value
    searcher.searchByIndexOrder(q, 10, numPartitions = 2).collect()
    val etDecodes = c.decoded.value - before2
    assert(fullDecodes > 4, s"fixture too small: full scan decoded $fullDecodes blocks")
    assert(etDecodes < fullDecodes,
      s"early termination decoded $etDecodes blocks, exhaustive $fullDecodes")
  }

  test("unsorted index refuses sorted collection") {
    val plain = IndexBuilder.build(
      spark.createDataset(CodeCorpus.files(32)), IndexConfig(analyzer = Analyzers.simple))
    val s = new GraftSearcher(plain, Analyzers.simple)
    intercept[IllegalArgumentException](s.searchByIndexOrder(TermQ("if"), 5))
  }

  test("multi-run sorted index: runs split per append, global merge still exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorttest-").toString
    val cfg = IndexConfig(analyzer = Analyzers.simple, sortFields = Seq("lang"))
    val (a, b) = corpus.splitAt(N / 2)
    IndexStore.buildAndCommit(spark.createDataset(a), dir, cfg)
    IndexStore.buildAndCommit(spark.createDataset(b), dir, cfg)
    val m = IndexStore.readManifest(dir).get
    assert(m.indexSort == Seq("lang"))
    assert(m.sortRuns.size == 2 && m.sortRuns.head == 0L)
    val idx = IndexStore.open(spark, dir)
    val s = new GraftSearcher(idx, Analyzers.simple)
    // expected: all matches ranked by the SORT FIELDS globally (runs are
    // only locally sorted, so the docId order is not the global answer)
    val byId = idx.docs.collect().map(d => d.docId -> (d.lang, d.repo, d.path, d.commit)).toMap
    val expected = s.matchesDS(TermQ("indexwriter")).collect()
      .sortBy(id => (byId(id), id)).take(10).toSeq
    val candidates = s.searchByIndexOrder(TermQ("indexwriter"), 10).collect()
    val got = candidates.sortBy(id => (byId(id), id)).take(10).toSeq
    assert(got == expected)
  }

  test("manifest round-trips indexSort and sortRuns") {
    val m = Manifest(3L, Seq(SegmentMeta("seg-a", 0L, 10L, 100L, 9L)), 1L,
      Seq("lang", "repo"), Seq(0L, 10L))
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-").toString
    IndexStore.writeManifest(dir, m)
    assert(IndexStore.readManifest(dir).contains(m))
  }
}
