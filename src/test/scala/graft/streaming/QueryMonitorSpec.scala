package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.analysis.Analyzers
import graft.fixtures.CodeCorpus
import graft.index._
import graft.search._

/** lucene/monitor (percolator) semantics: the standing-query matcher must
  * agree with the index-backed engine on every query shape, and run as a
  * Structured Streaming stage. */
class QueryMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nDocs = 400
  private lazy val files = CodeCorpus.files(nDocs)
  private lazy val docs = spark.createDataset(files)
  private lazy val index = IndexBuilder.build(docs, IndexConfig(numPartitions = 3))
  private lazy val searcher = new GraftSearcher(index)

  private val queries: Seq[(String, Query)] = Seq(
    "term" -> TermQ("indexwriter"),
    "bool_and" -> BoolQ(must = Seq(TermQ("indexwriter"), TermQ("return"))),
    "bool_or" -> BoolQ(should = Seq(TermQ("segment"), TermQ("buffer"))),
    "bool_not" -> BoolQ(must = Seq(TermQ("if")), mustNot = Seq(TermQ("segment"))),
    "msm" -> BoolQ(should = Seq(TermQ("if"), TermQ("return"), TermQ("import")),
      minShouldMatch = 2),
    "msm_must" -> BoolQ(must = Seq(TermQ("the")),
      should = Seq(TermQ("if"), TermQ("return"), TermQ("import")), minShouldMatch = 2),
    "phrase" -> PhraseQ(Seq("foo", "bar"), Seq(0, 1)), // foo.bar tokenizes per UAX
    "sloppy3" -> PhraseQ(Seq("if", "return", "import"), Seq(0, 1, 2), 3),
    "prefix" -> PrefixQ("index"),
    "fuzzy" -> FuzzyQ("segmant", 1),
    "range" -> TermRangeQ("if", "import", true, true),
    "dismax" -> DisMaxQ(Seq(TermQ("codec"), TermQ("weight")), 0.3f),
    "synonym" -> SynonymQ(Seq("codec", "weight")),
    "span_near" -> SpanNearQ(Seq("if", "return"), 4, inOrder = true),
    "span_unordered" -> SpanNearQ(Seq("segment", "buffer"), 5, inOrder = false),
    "span_first" -> SpanFirstQ("import", 8))

  test("standing-query matcher agrees with the index-backed engine") {
    val events = QueryMonitor.matchBatch(docs, queries, Analyzers.standard)
      .collect().groupBy(_.queryName).map { case (k, v) => k -> v.map(_.path).toSet }
    for ((name, q) <- queries) {
      val ids = searcher.matchesDS(q).collect().toSet
      val expect = index.docs.filter($"docId".isInCollection(ids))
        .collect().map(_.path).toSet
      assert(events.getOrElse(name, Set.empty) == expect,
        s"query '$name' diverged from the index engine")
    }
  }

  test("presearcher term extraction follows the weightor/conjunction rules") {
    // conjunction keeps the single best-weighted (longest) child
    assert(QueryMonitor.presearchTerms(
      BoolQ(must = Seq(TermQ("if"), TermQ("indexwriter")))) == Set("indexwriter"))
    // mustNot never contributes; must wins over it
    assert(QueryMonitor.presearchTerms(
      BoolQ(must = Seq(TermQ("segment")), mustNot = Seq(TermQ("buffer")))) ==
      Set("segment"))
    // phrase keeps its longest term
    assert(QueryMonitor.presearchTerms(
      PhraseQ(Seq("foo", "barbaz"), Seq(0, 1))) == Set("barbaz"))
    // disjunction unions all children
    assert(QueryMonitor.presearchTerms(
      BoolQ(should = Seq(TermQ("a"), TermQ("b")))) == Set("a", "b"))
    // a multi-term child can't be term-filtered -> ANYTOKEN (empty)
    assert(QueryMonitor.presearchTerms(
      BoolQ(should = Seq(TermQ("a"), PrefixQ("ind")))).isEmpty)
  }

  test("presearcher never loses a match (candidates are a superset)") {
    val matched = QueryMonitor.matchBatch(docs, queries, Analyzers.standard)
      .collect().groupBy(_.queryName)
      .map { case (k, v) => k -> v.map(_.path).toSet }
    val pre = QueryMonitor.presearchBatch(docs, queries, Analyzers.standard)
      .collect().groupBy(_.queryName)
    for ((name, _) <- queries) {
      val evs = pre.getOrElse(name, Array.empty[QueryMonitor.PresearchEvent])
      val cand = evs.map(_.path).toSet
      val conf = evs.filter(_.matched).map(_.path).toSet
      val expect = matched.getOrElse(name, Set.empty)
      assert(conf == expect, s"'$name': confirmed set diverged from matchBatch")
      assert(expect.subsetOf(cand), s"'$name': presearch dropped a match")
    }
    // and it actually prunes: a term query's candidates < corpus size
    val termCand = pre("term").length
    assert(termCand < nDocs)
  }

  test("runs as a Structured Streaming stage") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[CodeFile]
    val events = QueryMonitor.attach(source.toDS(), queries.take(3), Analyzers.standard)
    val q = events.writeStream.format("memory").queryName("monitor_out")
      .outputMode("append").start()
    try {
      source.addData(files.take(50): _*)
      q.processAllAvailable()
      val got = spark.table("monitor_out").collect()
      val expect = QueryMonitor.matchBatch(
        spark.createDataset(files.take(50)), queries.take(3), Analyzers.standard).count()
      assert(got.length.toLong == expect && expect > 0)
    } finally q.stop()
  }
}
