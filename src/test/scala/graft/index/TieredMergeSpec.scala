package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fixtures.CodeCorpus
import graft.search.GraftSearcher

/** Size-tiered merge planning: tier budgets, skew scoring, oversize
  * exclusion — plus end-to-end merge identity through the policy. */
class TieredMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Segments tile the docId space in declaration order (adjacency is part
    * of the planning contract — merges compact consecutive ranges). */
  private def segs(names: String*): Seq[SegmentMeta] =
    names.zipWithIndex.map { case (n, i) =>
      SegmentMeta(n, i * 100L, 100, 1000, i * 100L + 99)
    }
  private val MB = 1L << 20

  test("index within its tier budget plans no merges") {
    // 10 equal-size segments = exactly one full tier -> allowed
    val ss = segs((0 until 10).map(i => s"s$i"): _*)
    val sizes = ss.map(_.name -> 4 * MB).toMap
    assert(TieredPolicy.findMerges(ss, sizes) == Nil)
  }

  test("overflowing a tier merges the most balanced window of small segments") {
    // 14 segments of 4 MB: budget is 10/tier -> must merge; the best-scored
    // window is maxMergeAtOnce equal-size segments (lowest skew)
    val ss = segs((0 until 14).map(i => s"s$i"): _*)
    val sizes = ss.map(_.name -> 4 * MB).toMap
    val plan = TieredPolicy.findMerges(ss, sizes)
    assert(plan.size == 1)
    assert(plan.head.size == 10)
  }

  test("a lopsided index prefers merging the small tail, not big+small") {
    val ss = segs(((0 until 3).map(i => s"big$i") ++ (0 until 30).map(i => s"small$i")): _*)
    val sizes = ss.map(s =>
      s.name -> (if (s.name.startsWith("big")) 400 * MB else 4 * MB)).toMap
    val plan = TieredPolicy.findMerges(ss, sizes)
    assert(plan.size == 1)
    // the chosen merge is all-small: a big+small window has far worse skew
    assert(plan.head.forall(_.name.startsWith("small")), s"got ${plan.head.map(_.name)}")
    assert(plan.head.size == 10)
    // and the picked window is docId-consecutive
    val bases = plan.head.map(_.docBase)
    assert(bases == (bases.min to bases.max by 100L))
  }

  test("segments above half the max merged size are never candidates") {
    val huge = segs((0 until 30).map(i => s"huge$i"): _*)
    val sizes = huge.map(_.name -> 4096L * MB).toMap // 4 GB each > 5 GB / 2
    assert(TieredPolicy.findMerges(huge, sizes) == Nil)
  }

  test("merge window respects maxMergedSegmentBytes") {
    val pol = TieredPolicy(segsPerTier = 2, maxMergeAtOnce = 10,
      maxMergedSegmentBytes = 10 * MB)
    val ss = segs((0 until 8).map(i => s"s$i"): _*)
    val sizes = ss.map(_.name -> 3 * MB).toMap
    val plan = TieredPolicy.findMerges(ss, sizes, pol)
    assert(plan.size == 1)
    // at most 3 x 3 MB fit under the 10 MB cap
    assert(plan.head.size == 3)
  }

  test("tiered compaction end-to-end preserves results (merge identity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tiered-").toString
    val all = CodeCorpus.files(600)
    // 6 segments of 100 docs
    all.grouped(100).foreach { batch =>
      IndexStore.buildAndCommit(spark.createDataset(batch)(
        org.apache.spark.sql.Encoders.product[CodeFile]), dir, IndexConfig(numPartitions = 2))
    }
    val before = {
      val s = new GraftSearcher(IndexStore.open(spark, dir))
      s.search("if OR indexwriter OR mergepolicy", 20).toSeq
    }
    // tiny budget forces real merges through the size-tiered planner
    val pol = TieredPolicy(segsPerTier = 1, maxMergeAtOnce = 3,
      floorSegmentBytes = 1L, maxMergedSegmentBytes = 5L << 30)
    val m = SegmentMerger.compactTiered(spark, dir, IndexConfig(numPartitions = 2), pol)
    assert(m.segments.size < 6, s"expected merges, still ${m.segments.size} segments")
    val after = {
      val s = new GraftSearcher(IndexStore.open(spark, dir))
      s.search("if OR indexwriter OR mergepolicy", 20).toSeq
    }
    assert(after == before)
  }
}
