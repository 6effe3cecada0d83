package graft.tools

import org.apache.spark.sql.SparkSession

/** r06 auxiliary bench (guide §1.4): noop-sink isolation for ANY list of
  * SparkEntry queries, best-of-N, labeled jobs. NOT the driver's bench —
  * graft.Bench stays the frozen measurement surface; this exists so
  * OPTIMIZATION_r06.md can cite per-query numbers for queries the official
  * bench does not time (e.g. td_dedup_minhash_prod) without touching it.
  *
  * args: <sfDir> <query1,query2,...> [attempts=3]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1 && args(1) == "ALL")
        graft.SparkEntry.queries.keys.toArray.sorted
      else if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty)
      else Array("td_dedup_minhash_prod", "td_minhash_accuracy", "td_dsir",
        "td_ccnet_buckets", "td_dedup_jaccard")
    val attempts = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    names.foreach { name =>
      var best = Double.MaxValue
      var i = 0
      while (i < attempts) {
        spark.sparkContext.setJobDescription(s"benchextra: $name #$i")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      results(name) = best
      System.err.println(f"[benchextra] $name%-28s $best%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"benchextra":$qs,"sf":"$sfDir","attempts":$attempts}""")
    spark.stop()
  }
}
