package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.fixtures.CodeCorpus
import graft.index._

/** Stage-level profiling of the index build (dev tool) — mirrors
  * IndexBuilder.build stage by stage with no extra caching. */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft-bench-corpus-$n"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS")))
      CodeCorpus.dataset(spark, n).write.mode("overwrite").parquet(path)
    val files = spark.read.parquet(path).as[CodeFile]

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val cfg = IndexConfig(numPartitions = cpus.toInt)
    timed("0 read+count")(files.count())

    // mirror the production path: parquet-backed segment build
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-idx").toString
    val analyzed = IndexBuilder.analyze(IndexBuilder.assignDocIds(files, cfg.numPartitions), cfg)
    timed("A analyze->docmeta.parquet")(
      IndexBuilder.docsOf(analyzed).write.mode("overwrite").parquet(s"$dir/docmeta"))
    var fs: FieldStatsRow = null
    timed("B fieldStats from docmeta") {
      fs = IndexBuilder.fieldStatsOf(spark.read.parquet(s"$dir/docmeta").as[DocRow])
    }
    timed("C analyze->shuffle->encode->postings.parquet")(
      IndexBuilder.encodeBlocks(IndexBuilder.postingsOf(analyzed), cfg, fs.maxDocId + 1, fs.sumTotalTermFreq)
        .write.mode("overwrite").parquet(s"$dir/postings"))
    val blocks = spark.read.parquet(s"$dir/postings").as[BlockRow]
    timed("D termStats.parquet")(
      IndexBuilder.termStatsOf(blocks).write.mode("overwrite").parquet(s"$dir/termstats"))
    timed("E query warm: blocks filter one term")(
      blocks.filter($"term" === "indexwriter").count())
    spark.stop()
  }
}
