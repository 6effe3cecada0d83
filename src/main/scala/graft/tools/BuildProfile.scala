package graft.tools

import org.apache.spark.sql.SparkSession
import graft.fixtures.CodeCorpus
import graft.index._

/** Stage-level profiling of the index build (dev tool). */
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
    timed("1 assignDocIds.count")(IndexBuilder.assignDocIds(files, cfg.numPartitions).count())
    val numbered = IndexBuilder.assignDocIds(files, cfg.numPartitions)
    timed("2 analyze.count")(IndexBuilder.analyze(numbered, cfg).count())
    val analyzed = IndexBuilder.analyze(numbered, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("3 analyze.persist.count")(analyzed.count())
    timed("4 postings.count")(IndexBuilder.postingsOf(analyzed).count())
    timed("5 encodeBlocks.count")(IndexBuilder.encodeBlocks(IndexBuilder.postingsOf(analyzed), cfg, n).count())
    timed("6 full build fresh")({
      val idx = IndexBuilder.build(files, cfg)
      idx.blocks.count()
    })
    spark.stop()
  }
}
