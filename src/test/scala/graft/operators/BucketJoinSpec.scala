package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bucketed co-located join — the canonical 100-TB fact-fact join shape:
  * both tables pre-bucketed (and sorted) on the join key means the
  * SortMergeJoin reads each side's buckets directly, with ZERO shuffle
  * exchanges; the same join over plain parquet shuffles both sides. This is
  * the storage-layout contract an Iceberg warehouse would carry
  * (write.distribution-mode + sorted files); asserted here at the physical
  * plan level and cross-checked for row-identical results. */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val sfDir = "/root/testdata/sf0.001"
    // fact-fact regime: at 100 TB neither side broadcasts — disable the
    // small-table broadcast the tiny test SF would otherwise trigger
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

    def joined(li: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      li.select("l_orderkey", "l_quantity")
        .join(o.select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))

    val bucketed = joined(spark.table("lineitem_b"), spark.table("orders_b"))
    val plain = joined(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      spark.read.parquet(s"$sfDir/orders.parquet"))

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

    // the plain join shuffles (broadcast or hash exchanges present);
    // the bucketed join must have NO exchange of any kind
    assert(exchanges(bucketed) === 0,
      bucketed.queryExecution.executedPlan.toString.take(4000))
    assert(exchanges(plain) > 0)

    // identical results either way
    assert(bucketed.count() === plain.count())
    val a = bucketed.agg(sum("l_quantity")).head().getDouble(0)
    val b = plain.agg(sum("l_quantity")).head().getDouble(0)
    assert(a === b)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
