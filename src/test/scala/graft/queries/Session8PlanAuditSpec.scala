package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan audits for this session's operators: the 100-TB scale
  * claims in their Scaladoc (equi-join blocking instead of cross joins,
  * map-only hash chains, TakeOrdered instead of global sorts) must be
  * visible in the executed plan. */
class Session8PlanAuditSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q_matrix_mult contracts via an equi-join, never a cross product") {
    val p = plan("q_matrix_mult")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("td_rouge_overlap joins on (pair, gram) — no all-pairs stage") {
    val p = plan("td_rouge_overlap")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("td_semdedup pairs only within clusters (equi-join on cl)") {
    val p = plan("td_semdedup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("ft_jaro_pairs blocks on the term prefix (equi-join)") {
    val p = plan("ft_jaro_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("ft_shard_route is one map-side hash chain + one aggregation") {
    val p = plan("ft_shard_route")
    assert(!p.contains("Join"), p.take(2000))
    // groupBy(source) agg + the final ORDER BY are the only exchanges
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"$exchanges exchanges\n${p.take(3000)}")
  }

  test("q_priority takes the top-k without a global sort") {
    assert(plan("q_priority").contains("TakeOrderedAndProject"))
  }

  test("q_bucketed_join shuffles NEITHER side of the join") {
    val p = plan("q_bucketed_join")
    assert(!p.contains("hashpartitioning(l_orderkey"), p.take(3000))
    assert(!p.contains("hashpartitioning(o_orderkey"), p.take(3000))
  }

  test("q_partition_prune pushes the partition filter into the scan") {
    val p = plan("q_partition_prune")
    assert(p.contains("PartitionFilters") &&
      p.contains("event_type") && p.contains("purchase"), p.take(3000))
  }

  test("q_salted_agg spreads the hot key over 16 salted partials") {
    val p = plan("q_salted_agg")
    // two HashAggregate pairs: (key, salt) partials then per-key combine
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 4, s"$aggs HashAggregates\n${p.take(3000)}")
  }
}
