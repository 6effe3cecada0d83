package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fixtures.CodeCorpus
import graft.index._

/** Stage-level profiling of the index build (dev tool) — mirrors
  * IndexBuilder.build stage by stage, plus r06 optimization variants
  * (broadcast docId attach, single-pass analysis) measured side by side. */
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

    val path = s"/tmp/graft-bench-corpus-$n-p64"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS")))
      CodeCorpus.dataset(spark, n, parts = 64).write.mode("overwrite").parquet(path)
    val files = spark.read.parquet(path).as[CodeFile]

    def noop(df: org.apache.spark.sql.Dataset[_]): Unit =
      df.toDF().write.mode("overwrite").format("noop").save()
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val cfg = IndexConfig(numPartitions = cpus.toInt)
    timed("0 read+count warm")(files.count())
    timed("0 read+count warm2")(files.count())

    // ---- decomposition of the current path ----
    timed("P1 assignDocIds -> noop")(
      noop(IndexBuilder.assignDocIds(files, cfg.numPartitions)))
    val analyzed = IndexBuilder.analyze(IndexBuilder.assignDocIds(files, cfg.numPartitions), cfg)
    timed("P2 analyze -> noop")(noop(analyzed))
    timed("P2b analyze -> noop again (shuffle reuse)")(noop(analyzed))
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-idx").toString
    timed("P3 analyze -> docmeta.parquet zstd")(
      IndexBuilder.docsOf(analyzed).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$dir/docmeta"))
    var fs: FieldStatsRow = null
    timed("P4 fieldStats from docmeta") {
      fs = IndexBuilder.fieldStatsOf(spark.read.parquet(s"$dir/docmeta").as[DocRow])
    }
    timed("P5 postingsOf -> noop (analysis+flatmap)")(
      noop(IndexBuilder.postingsOf(analyzed)))
    timed("P6 encodeBlocks -> noop (+shuffle+encode)")(
      noop(IndexBuilder.encodeBlocks(IndexBuilder.postingsOf(analyzed), cfg,
        fs.maxDocId + 1, fs.sumTotalTermFreq)))
    timed("P7 encodeBlocks -> postings.parquet zstd")(
      IndexBuilder.encodeBlocks(IndexBuilder.postingsOf(analyzed), cfg,
        fs.maxDocId + 1, fs.sumTotalTermFreq)
        .write.mode("overwrite").option("compression", "zstd").parquet(s"$dir/postings"))
    val blocks = spark.read.parquet(s"$dir/postings").as[BlockRow]
    timed("P8 termStats -> parquet")(
      IndexBuilder.termStatsOf(blocks).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$dir/termstats"))

    // ---- variant A: broadcast keyIds attach (content never shuffled) ----
    val keyIds = files
      .select($"repo", $"path", $"commit")
      .repartitionByRange(cfg.numPartitions, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
      .as[(String, String, String)]
      .rdd.zipWithIndex()
      .map { case ((r, p, c), i) => (r, p, c, i) }
      .toDF("_r", "_p", "_c", "_docId")
    val numberedB = files
      .join(broadcast(keyIds),
        files("repo") === keyIds("_r") && files("path") === keyIds("_p") &&
          files("commit") === keyIds("_c"))
      .select(
        struct($"repo", $"path", $"commit", $"lang", $"content", $"sha256").as("_1"),
        $"_docId".as("_2"))
      .as[(CodeFile, Long)]
    timed("V1 analyze(bcast attach) -> noop")(noop(IndexBuilder.analyze(numberedB, cfg)))
    timed("V1b analyze(bcast attach) -> noop again")(noop(IndexBuilder.analyze(numberedB, cfg)))

    // ---- variant B: single-pass via persisted analyzed (columnar cache) ----
    val analyzedC = IndexBuilder.analyze(numberedB, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-profile-idx2").toString
    timed("V2 analyze+persist -> docmeta.parquet")(
      IndexBuilder.docsOf(analyzedC).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$dir2/docmeta"))
    timed("V3 persisted -> encode -> postings.parquet")(
      IndexBuilder.encodeBlocks(IndexBuilder.postingsOf(analyzedC), cfg,
        fs.maxDocId + 1, fs.sumTotalTermFreq)
        .write.mode("overwrite").option("compression", "zstd").parquet(s"$dir2/postings"))
    timed("V4 persisted fieldStats (no docmeta read)") {
      IndexBuilder.fieldStatsOf(IndexBuilder.docsOf(analyzedC))
    }
    analyzedC.unpersist()

    spark.stop()
  }
}
