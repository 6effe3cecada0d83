package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Differential audit for the AllPairs/PPJoin prefix-filtered Jaccard dedup
  * (td_dedup_jaccard): the prefix filter is a pruning strategy, never a
  * semantics change — its pair set must equal the brute-force all-pairs
  * join on the same corpus, and the physical plan must not contain the
  * O(n²) per-block cross join it replaces. */
class JaccardPPJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  private def bruteForce() = {
    val sets = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"), array_distinct(expr(TOKS)).as("tk"))
    val a = sets.select(col("lang"), col("doc_id").as("a"), col("tk").as("ta"))
    val b = sets.select(col("lang"), col("doc_id").as("b"), col("tk").as("tb"))
    a.join(b, "lang").filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        size(col("ta")).cast("long").as("na"),
        size(col("tb")).cast("long").as("nb"))
      .filter(col("inter") * 3 >= col("na") + col("nb"))
  }

  test("prefix-filtered pair set equals brute-force all-pairs") {
    val pp = graft.queries.TrainingDataQueries.queries("td_dedup_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bf = bruteForce()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pp.nonEmpty, "fixture produced no duplicate pairs — test is vacuous")
    assert(pp == bf)
  }

  test("candidate generation is an equi-join on prefix tokens, not a cross join") {
    val df = graft.queries.TrainingDataQueries.queries("td_dedup_jaccard")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }
}
