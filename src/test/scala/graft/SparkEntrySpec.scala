package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke suite: every SparkEntry query must run on the
  * sf0.001 testdata and produce a non-degenerate result, and every oracle key
  * must exist in `queries`. Full value-level verification happens in the
  * driver's DuckDB compare at sf0.01 (validated locally — see also the
  * operator-level differential specs). */
class SparkEntrySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // queries expected to possibly return few rows but never fail
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      // results must be lowercase-named for the driver's column-sorted hash
      assert(df.columns.forall(c => c == c.toLowerCase),
        s"non-lowercase columns: ${df.columns.mkString(",")}")
    }
  }
}
