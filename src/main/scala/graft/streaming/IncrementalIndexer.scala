package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.{CodeFile, IndexConfig, IndexStore}

/** Incremental (near-real-time) indexing: the Spark-native re-expression of
  * the reference's NRT ingest — Lucene soft commits + Solr `TopicStream` /
  * `DaemonStream` checkpointed micro-batch pull (reference:
  * solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/TopicStream.java,
  * DaemonStream.java; NRT readers: lucene/core/src/java/org/apache/lucene/index/
  * DirectoryReader.java `open(IndexWriter)`).
  *
  * Each micro-batch becomes one committed segment (manifest generation bump ≙
  * `segments_N`); readers opening the index after a trigger see the new docs.
  * Exactly Lucene's DWPT-flush-per-buffer model with the stream trigger as
  * the flush policy.
  *
  * Idempotence/resume: the segment is named by `batchId`, so a batch replayed
  * after a failure (Structured Streaming's at-least-once `foreachBatch`
  * contract) finds its segment already in the manifest and skips — giving
  * effectively-once commits on top of the checkpointed source offsets.
  */
object IncrementalIndexer {

  /** Start indexing a streaming Dataset of input rows into `indexDir`.
    * `docBaseStride` reserves a docId range per batch: batch i's docIds live
    * in [i*stride, i*stride + count), keeping ids disjoint and deterministic
    * without cross-batch coordination. */
  def start(
      stream: Dataset[CodeFile],
      indexDir: String,
      checkpointDir: String,
      cfg: IndexConfig = IndexConfig(),
      docBaseStride: Long = 1L << 32,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CodeFile], batchId: Long) =>
        commitBatch(batch, batchId, indexDir, cfg, docBaseStride)
        ()
      }
      .start()
  }

  /** Commit one micro-batch as one segment (skips if already committed).
    *
    * SINGLE-WRITER contract: the manifest read-modify-write here is not
    * atomic against a concurrent `SegmentMerger.compact` on the same index
    * dir — exactly Lucene's rule that one `IndexWriter` (holding write.lock)
    * owns an index at a time (reference:
    * lucene/core/src/java/org/apache/lucene/index/IndexWriter.java write.lock).
    * Run compaction from the same single writer (e.g. inside foreachBatch
    * between commits), never as a parallel job. */
  def commitBatch(
      batch: Dataset[CodeFile],
      batchId: Long,
      indexDir: String,
      cfg: IndexConfig,
      docBaseStride: Long): Unit = {
    val segName = f"seg-batch-$batchId%08d"
    val prev = IndexStore.readManifest(indexDir)
    if (prev.exists(_.segments.exists(_.name == segName))) return // replayed batch
    if (batch.isEmpty) return
    val meta = IndexStore.buildSegment(
      batch, indexDir, segName, cfg, docBase = batchId * docBaseStride)
    val gen = prev.map(_.generation + 1).getOrElse(0L)
    IndexStore.writeManifest(indexDir,
      graft.index.Manifest(gen, prev.map(_.segments).getOrElse(Nil) :+ meta,
        prev.map(_.delGen).getOrElse(-1L),
        cfg.sortFields,
        prev.map(_.sortRuns).getOrElse(Nil) :+ batchId * docBaseStride,
        prev.map(_.dvGen).getOrElse(-1L)))
  }
}
