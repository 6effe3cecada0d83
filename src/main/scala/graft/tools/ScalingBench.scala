package graft.tools

import org.apache.spark.sql.SparkSession
import graft.fixtures.CodeCorpus
import graft.index.{CodeFile, IndexBuilder, IndexConfig}

/** Scaling-efficiency evidence for the north rule: the same index build on
  * the same input at two parallelism levels (local[N] vs local[4N] standing
  * in for N vs 4N executors — no real cluster in this sandbox). Run twice:
  *
  *   SPARK_GRAFT_CPUS=8  sbt -batch "runMain graft.tools.ScalingBench"
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.ScalingBench"
  *
  * efficiency = (T_8 / T_32) / 4; target >= 0.8 (BASELINE.json).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DOCS", "400000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // stage-level timing: which stage dominates at scale
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s <- si.submissionTime; e <- si.completionTime } yield (e - s) / 1000.0
        if (dur.exists(_ > 5.0))
          println(f"[stage] id=${si.stageId}%d dur=${dur.get}%.1fs tasks=${si.numTasks}%d ${si.name.take(90)}%s")
      }
    })

    // stage with a FIXED width well above the largest parallelism level:
    // each part file is one parquet row group (unsplittable), so a corpus
    // staged at 8 parts caps every scan stage at 8 tasks and silently
    // rigs the 8 -> 32 comparison against local[32]. At real scale the
    // input is an Iceberg table with many files — 64 parts mirrors that.
    val path = s"/tmp/graft-bench-corpus-$n-p64"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/_SUCCESS")))
      CodeCorpus.dataset(spark, n, parts = 64).write.mode("overwrite").parquet(path)
    val files = spark.read.parquet(path).as[CodeFile]

    // one untimed warm-up pass over a slice (JIT + page cache)
    IndexBuilder.build(files.limit(20000), IndexConfig(numPartitions = cpus)).blocks.count()

    val t0 = System.nanoTime()
    val idx = IndexBuilder.build(files, IndexConfig(numPartitions = cpus))
    val nBlocks = idx.blocks.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"scaling_build_sec","value":$sec%.2f,"unit":"sec","cpus":$cpus%d,"docs":$n%d,"docs_per_sec":${(n / sec).toLong}%d,"blocks":$nBlocks%d}""")
    spark.stop()
  }
}
