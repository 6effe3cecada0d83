package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}

/** Segment merge = sort-merge over (term, docId)-keyed Datasets
  * (the Spark-native re-expression of `SegmentMerger.merge`'s PQ-driven
  * term/posting merge, reference:
  * lucene/core/src/java/org/apache/lucene/index/SegmentMerger.java:96-150 and
  * `MultiTermsEnum`/`DocIDMerger`).
  *
  * DocId rebasing note: Lucene assigns per-segment 0-based ids and rebases at
  * merge (`DocIDMerger.java:32,123-127`); we instead assign GLOBAL ids at
  * build time (each segment gets a contiguous [docBase, docBase+n) range), so
  * merging never renumbers — the union of segment doc spaces is already the
  * merged doc space. The merge is then exactly: decode all segments' blocks
  * back to postings, one term-hash shuffle, re-encode — identical output to
  * a single-shot build by construction (tested as the merge-identity
  * property, the `TestTopDocsMerge` idea).
  */
object SegmentMerger {

  /** Decode a block table back into posting rows (streamed, not materialized). */
  def decodeToPostings(blocks: Dataset[BlockRow]): Dataset[PostingRow] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.flatMap { b =>
      val eb = graft.codec.EncodedBlock(b.count, b.firstDocId, b.lastDocId, b.blockTtf,
        b.docsEnc, b.freqsEnc, b.normsEnc, b.posEnc, Array.empty)
      val d = graft.codec.PostingsCodec.decodeAll(eb)
      (0 until b.count).iterator.map { i =>
        PostingRow(b.term, d.docIds(i), d.freqs(i), d.positions(i), d.norms(i))
      }
    }
  }

  /** Merge ALL committed segments into one and commit a new generation.
    * Stage outputs are checkpointed like the build path. */
  def mergeAll(spark: SparkSession, indexDir: String, cfg: IndexConfig = IndexConfig()): Manifest = {
    import spark.implicits._
    val m = IndexStore.readManifest(indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    if (m.segments.size <= 1) return m
    mergeSegments(spark, indexDir, m, m.segments, cfg)
  }

  /** Merge a chosen subset of segments into one; keeps the rest. */
  def mergeSegments(
      spark: SparkSession,
      indexDir: String,
      m: Manifest,
      toMerge: Seq[SegmentMeta],
      cfg: IndexConfig): Manifest = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = m.generation + 1
    val segName = f"seg-$gen%05d-merged"
    val segDir = s"$indexDir/$segName"
    val docsPath = s"$segDir/docmeta"
    val blocksPath = s"$segDir/postings"
    val statsPath = s"$segDir/termstats"
    def done(p: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(p, "_SUCCESS"))

    // tombstoned docs are physically dropped while rewriting — the merge IS
    // the delete purge (Lucene: SegmentMerger honors liveDocs)
    val deletes = IndexStore.readDeletes(spark, indexDir, m).toDF("_del")
    def purge[T](ds: Dataset[T], idCol: String): Dataset[T] =
      if (!m.hasDeletes) ds
      else ds.join(deletes, col(idCol) === col("_del"), "left_anti").as[T](ds.encoder)

    if (!done(docsPath)) {
      val docs = toMerge.map(s => spark.read.parquet(s"$indexDir/${s.name}/docmeta").as[DocRow])
        .reduce(_ union _)
      purge(docs, "docId").write.mode("overwrite").parquet(docsPath)
    }
    if (!done(blocksPath)) {
      val allBlocks = toMerge.map(s => spark.read.parquet(s"$indexDir/${s.name}/postings").as[BlockRow])
        .reduce(_ union _)
      val postings = purge(decodeToPostings(allBlocks), "docId")
      IndexBuilder.encodeBlocks(postings, cfg, toMerge.map(_.maxDocId).max + 1,
          toMerge.map(_.sumTotalTermFreq).sum)
        .write.mode("overwrite").parquet(blocksPath)
    }
    if (!done(statsPath)) {
      IndexBuilder.termStatsOf(spark.read.parquet(blocksPath).as[BlockRow])
        .write.mode("overwrite").parquet(statsPath)
    }
    val mergedDocs = spark.read.parquet(docsPath).as[DocRow]
    val fs = IndexBuilder.fieldStatsOf(mergedDocs)
    val merged = SegmentMeta(segName,
      toMerge.map(_.docBase).min,
      fs.docCount,
      fs.sumTotalTermFreq,
      toMerge.map(_.maxDocId).max)
    val keep = m.segments.filterNot(s => toMerge.exists(_.name == s.name))
    // tombstones are fully applied only when every segment was rewritten;
    // on a partial merge they must survive for the untouched segments (the
    // purged docs' ids staying in the set is harmless — nothing matches them)
    val newDelGen = if (keep.isEmpty) -1L else m.delGen
    val newManifest = Manifest(gen, keep :+ merged, newDelGen)
    IndexStore.writeManifest(indexDir, newManifest)
    newManifest
  }

  /** Tiered compaction: while more than `maxSegments` live segments, merge
    * the `mergeFactor` smallest into one — the driver-side planning loop
    * standing in for `TieredMergePolicy.findMerges`
    * (reference: lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:312-430;
    * defaults: <=10 segments/tier, merge <=10 at once, :96-103). */
  def compact(
      spark: SparkSession,
      indexDir: String,
      cfg: IndexConfig = IndexConfig(),
      maxSegments: Int = 10,
      mergeFactor: Int = 10): Manifest = {
    var m = IndexStore.readManifest(indexDir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $indexDir"))
    while (m.segments.size > maxSegments) {
      val smallest = m.segments.sortBy(_.docCount).take(mergeFactor)
      m = mergeSegments(spark, indexDir, m, smallest, cfg)
    }
    m
  }
}
