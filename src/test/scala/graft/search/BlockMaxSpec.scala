package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.index._

/** Mixed-shape block-max execution + the cross-partition score floor:
  *  - phrase-AND-term / must+should / NOT-carrying queries run the
  *    generalized block-max conjunction ([[TopK.conjunctionTopK]]) and the
  *    exclusion-aware WAND disjunction, rank-identical to the exhaustive
  *    oracle, with the skip counters proving ranges were jumped on impact
  *    metadata alone.
  *  - [[ScoreFloor]] shares the k-th-best score across doc-range partitions
  *    (the `MaxScoreAccumulator` analog); a published floor makes weak
  *    partitions skip whole block ranges without changing the global top-k.
  */
class BlockMaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a corpus engineered for skewed impact frontiers: 2500 docs, a few hot
  // terms everywhere at tf 1 plus a small slice of docs where they repeat
  // heavily (the competitive blocks), so most blocks are non-competitive
  // once the heap floor rises
  private lazy val index = {
    val rnd = new scala.util.Random(1234)
    val filler = Array("alpha", "beta", "gamma", "delta")
    val files = (0 until 2500).map { i =>
      val sb = new StringBuilder
      val hotReps = if (i % 97 == 0) 12 else 1 // every ~97th doc is heavy
      for (_ <- 0 until hotReps) sb.append("merge policy ")
      if (i % 3 == 0) sb.append("writer ")
      for (_ <- 0 until 4 + rnd.nextInt(20)) {
        sb.append(filler(rnd.nextInt(filler.length))).append(' ')
      }
      CodeFile("r", f"f$i%05d", "c0", "txt", sb.toString)
    }
    IndexBuilder.build(spark.createDataset(files), IndexConfig(numPartitions = 6))
  }
  private lazy val searcher = new GraftSearcher(index)

  private def skipDelta(body: => Unit): Long = {
    val before = searcher.counters.skipped.value: Long
    body
    (searcher.counters.skipped.value: Long) - before
  }

  test("mixed conjunction shapes are rank-identical AND skip block ranges") {
    val queries = Seq(
      "\"merge policy\" AND writer", // phrase-in-AND (mixed children)
      "merge AND writer",            // plain term conjunction
      "merge AND (policy OR writer)",// nested bool child
      "\"merge policy\"",            // bare phrase root (inner-conj pruning)
      "merge AND writer OR policy")  // must+should (ReqOpt bounds)
    var skipped = 0L
    for (q <- queries; k <- Seq(1, 5)) {
      val ast = searcher.parse(q)
      skipped += skipDelta {
        assert(searcher.search(ast, k).toSeq == searcher.bruteForce(ast, k).toSeq,
          s"$q k=$k diverged from the exhaustive oracle")
      }
    }
    assert(skipped > 0, "no block range was ever skipped — block-max is not engaging")
  }

  test("NOT-carrying disjunction prunes through the exclusion") {
    val ast = searcher.parse("merge OR policy NOT writer")
    val d = skipDelta {
      assert(searcher.search(ast, 5).toSeq == searcher.bruteForce(ast, 5).toSeq)
    }
    assert(d > 0, "exclusion-aware WAND produced no skips")
  }

  test("must+should+minShouldMatch matches Lucene's required-msm semantics") {
    // msm binds the SHOULD clauses even when MUST clauses exist
    val q = BoolQ(
      must = Seq(TermQ("merge")),
      should = Seq(TermQ("writer"), TermQ("policy"), TermQ("alpha")),
      minShouldMatch = 2)
    val got = searcher.matchesDS(q).collect().toSet
    val expect = {
      val m = searcher.matchesDS(TermQ("merge")).collect().toSet
      val s = Seq("writer", "policy", "alpha")
        .map(t => searcher.matchesDS(TermQ(t)).collect().toSet)
      m.filter(d => s.count(_.contains(d)) >= 2)
    }
    assert(got == expect)
    assert(searcher.search(q, 10).toSeq == searcher.bruteForce(q, 10).toSeq)
  }

  test("ScoreFloor publishes monotonically, strict-compares, clears") {
    val id = 987654321L
    assert(ScoreFloor.get(id) == Float.NegativeInfinity)
    assert(ScoreFloor.strictBound(id) == Double.NegativeInfinity)
    ScoreFloor.publish(id, 2.5f)
    ScoreFloor.publish(id, 1.0f) // lower publish never lowers the floor
    assert(ScoreFloor.get(id) == 2.5f)
    ScoreFloor.publish(id, 3.75f)
    assert(ScoreFloor.get(id) == 3.75f)
    // strict bound: bound <= strictBound iff bound < floor
    assert(3.75f.toDouble > ScoreFloor.strictBound(id))
    assert(Math.nextDown(3.75f).toDouble <= ScoreFloor.strictBound(id))
    // zero/negative scores and the disabled id are ignored
    ScoreFloor.publish(id, 0f)
    ScoreFloor.publish(0L, 99f)
    assert(ScoreFloor.get(0L) == Float.NegativeInfinity)
    ScoreFloor.clear(id)
    assert(ScoreFloor.get(id) == Float.NegativeInfinity)
  }

  test("a published floor makes weak partitions skip; results unchanged") {
    // manual single-term collector driven with a pre-published global floor:
    // floor above every score -> everything pruned locally (those docs could
    // never enter the global top-k); tiny floor -> identical results
    val t = "writer"
    val (_, ctx) = searcher.plan(TermQ(t))
    val blocks = index.blocks.filter($"term" === t).as[BlockRow]
      .collect().sortBy(_.firstDocId)
    val maxDoc = index.fieldStats.maxDocId + 1
    def run(floorId: Long): Array[ScoreDoc] = {
      val it = new TermIterator(blocks,
        Bm25.scorer(1f, Bm25.DEFAULT_K1, Bm25.DEFAULT_B, ctx.docFreq(t), ctx.stats),
        0L, maxDoc)
      TopK.singleTerm(it, 10, null, null, floorId)
    }
    val base = run(0L)
    assert(base.nonEmpty)

    val lowId = 555001L
    ScoreFloor.publish(lowId, Math.nextUp(0f)) // floor below every real score
    assert(run(lowId).toSeq == base.toSeq)
    ScoreFloor.clear(lowId)

    val highId = 555002L
    ScoreFloor.publish(highId, base.head.score * 4f) // floor above every score
    assert(run(highId).isEmpty,
      "a floor above all scores must prune the whole partition")
    ScoreFloor.clear(highId)
  }

  test("search() clears its floor id") {
    searcher.search("merge AND writer", 5)
    assert(ScoreFloor.get(searcher.lastFloorIdForTest) == Float.NegativeInfinity)
  }
}
