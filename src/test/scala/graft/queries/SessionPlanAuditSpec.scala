package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan audits for the session's new operators: the scale
  * properties claimed in their Scaladoc (small side broadcasts, single
  * shuffle aggregations) must be visible in the executed plan. */
class SessionPlanAuditSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q_currency broadcasts the rate table") {
    assert(plan("q_currency").contains("Broadcast"))
  }

  test("td_oov_rate broadcasts the bounded vocab, val side streams") {
    assert(plan("q_currency").nonEmpty) // force init order stability
    assert(plan("td_oov_rate").contains("BroadcastHashJoin"))
  }

  test("q_predict broadcasts the 1-row coefficient frame") {
    assert(plan("q_predict").contains("Broadcast"))
  }

  test("q_analytics_expr folds the whole expression tree into hash aggregation") {
    val p = plan("q_analytics_expr")
    assert(p.contains("HashAggregate"), p.take(2000))
    // count-distinct expands to two agg phases; anything beyond its two
    // exchanges means the expression tree fell out of the aggregate
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"$exchanges exchanges\n${p.take(3000)}")
  }

  test("td_cluster_labels keeps the per-cluster totals on the broadcast side") {
    assert(plan("td_cluster_labels").contains("BroadcastHashJoin"))
  }
}
