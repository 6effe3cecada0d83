package graft

import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzers
import graft.fixtures.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.GraftSearcher

/** Benchmark main. Headline metrics (BASELINE.md):
  *  - `index_build`: docs/sec building the inverted index over a
  *    deterministic synthetic code corpus (input_hint shape), scaled by SF
  *  - `search_*`: top-k latency for the reference query-set shapes
  *    (term / AND / OR / phrase) through block-max pruning
  *  - selected relational + training-data pipeline queries over the SF dir
  *
  * Prints ONE JSON line. `SPARK_GRAFT_CPUS` sets parallelism (the
  * N-vs-4N scaling evidence runs this at 8 and 32).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val corpusDocs = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // host calibration markers, measured FIRST: this sandbox's anonymous
    // page faults run ~500x slow in bad windows and CPU bursts swing >10x
    // between runs (BASELINE.md postmortem), so every absolute number below
    // only means something relative to these two denominators.
    //  - calib_fault_sec: allocate + touch 512 MB fresh heap (the fault path)
    //  - calib_cpu_sec:   fixed pure-ALU loop (the CPU-starvation path)
    // BASELINE.md records good-window values; compare ratios, not absolutes.
    val calibFault = {
      val t0 = System.nanoTime()
      val arr = new Array[Long](64 << 20)
      var acc = 0L
      var i = 0
      while (i < arr.length) { arr(i) = i * 0x9E3779B97F4A7C15L; acc ^= arr(i); i += 1 }
      if (acc == 42L) print("")
      (System.nanoTime() - t0) / 1e9
    }
    val calibCpu = {
      val t0 = System.nanoTime()
      var h = 0x123456789L
      var i = 0
      while (i < (1 << 27)) { h = h * 6364136223846793005L + 1442695040888963407L; i += 1 }
      if (h == 42L) print("")
      (System.nanoTime() - t0) / 1e9
    }
    //  - calib_disk_sec: 128 MB write + fsync to tmp (the segment/shuffle
    //    write path; this box throttles to ~20 MB/s in bad windows vs
    //    >500 MB/s in good ones — the single biggest swing dimension).
    //    The fsync makes the probe measure the DEVICE: a purely buffered
    //    write can land in free page cache and read healthy during a real
    //    write-throttle window. Healthy < ~2s.
    val calibDisk = {
      val chunk = Array.tabulate[Byte](1 << 20)(_.toByte)
      val f = java.io.File.createTempFile("graft-calib-", ".bin")
      val t0 = System.nanoTime()
      val os = new java.io.FileOutputStream(f)
      try {
        var i = 0
        while (i < 128) { os.write(chunk); i += 1 }
        os.getFD.sync()
      } finally os.close()
      val sec = (System.nanoTime() - t0) / 1e9
      f.delete()
      sec
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // this host suffers tens-of-seconds noisy-neighbor CPU-starvation bursts
    // (BASELINE.md postmortem): a single timing can be 5-15x off, so every
    // metric is the best of N attempts — steady-state engine throughput, not
    // burst luck
    def timedBest[T](name: String, attempts: Int)(f: => T): T = {
      var best = Double.MaxValue
      var r: T = null.asInstanceOf[T]
      var i = 0
      while (i < attempts) {
        val t0 = System.nanoTime()
        r = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      results(name) = best
      r
    }

    // 1. index build throughput over the synthetic code corpus. The corpus
    //    is staged to parquet UNTIMED: at real scale the input is an
    //    Iceberg/parquet table, so the timed section measures the engine
    //    (scan -> sha verify -> analyze -> shuffle -> encode), not the
    //    generator.
    import spark.implicits._
    // fixed 64-part staging: one part file = one row group = one scan task,
    // so the staging width must exceed every parallelism level benched (see
    // ScalingBench) — otherwise the scan stages cap below `cpus`
    val corpusPath = s"/tmp/graft-bench-corpus-$corpusDocs-p64"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$corpusPath/_SUCCESS")))
      CodeCorpus.dataset(spark, corpusDocs, parts = 64).write.mode("overwrite").parquet(corpusPath)
    val files = spark.read.parquet(corpusPath).as[graft.index.CodeFile]
    // one untimed warm-up pass over a slice (JIT compile the analyzer/codec
    // hot loops + fault the heap's working set — this host faults anonymous
    // pages ~500x slower than normal, so the first pass pays a one-off
    // kernel cost that is NOT steady-state engine throughput; mirrors
    // ScalingBench's warm-up)
    IndexBuilder.build(files.limit(20000), IndexConfig(numPartitions = cpus.toInt))
      .blocks.count()
    val index = timedBest("index_build", 3) {
      val idx = IndexBuilder.build(files, IndexConfig(numPartitions = cpus.toInt))
      idx.blocks.count() // force full materialization
      idx
    }
    val docsPerSec = corpusDocs / results("index_build")
    val searcher = new GraftSearcher(index, Analyzers.standard)
    index.termStats.count() // warm stats

    // 2. query latency, reference query-set shapes (searches are repeated
    //    3x and the best run reported — JIT/warm-cache steady state)
    def bench(name: String, q: String): Unit = {
      var best = Double.MaxValue
      var i = 0
      while (i < 3) {
        val t0 = System.nanoTime()
        searcher.search(q, 10)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      results(name) = best
    }
    bench("search_term", "indexwriter")
    bench("search_and", "indexwriter AND mergepolicy")
    bench("search_or", "parsequery OR mergepolicy OR segment")
    bench("search_phrase", "\"merge policy\"")
    bench("search_skewed_or", "if OR return OR import")

    // 3. relational + training-data pipeline over the SF dir.
    //    The documents index is warmed untimed (its build cost is the
    //    index_build metric above, not per-query latency).
    graft.queries.DocsIndex.get(spark, sfDir)
    def benchQuery(name: String): Unit = timedBest(name, 2) {
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    benchQuery("q1_agg")
    benchQuery("q_join_star")
    benchQuery("td_dedup_minhash_lsh")
    benchQuery("td_knn_exact")
    benchQuery("ft_search_bool")

    val total = results.values.sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // pruning evidence: posting blocks decoded vs skipped whole on impact
    // metadata across the search_* benches above (block-max WAND/conjunction)
    val dec: Long = searcher.counters.decoded.value
    val skp: Long = searcher.counters.skipped.value
    println(f"""{"metric":"total_sec","value":$total%.3f,"unit":"sec","queries":$qs,"docs_per_sec":${docsPerSec.toLong}%d,"corpus_docs":$corpusDocs%d,"cpus":$cpus,"blocks_decoded":$dec%d,"blocks_skipped":$skp%d,"calib_fault_sec":$calibFault%.3f,"calib_cpu_sec":$calibCpu%.3f,"calib_disk_sec":$calibDisk%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
