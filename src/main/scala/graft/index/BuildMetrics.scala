package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.util.AccumulatorV2
import scala.jdk.CollectionConverters._

/** One encode task's lineage + throughput record — the north rule's
  * "per-partition lineage + postings/sec metrics recorded per task".
  * Lineage = which shuffle partition the task was, which task attempt ran
  * it, and the docId range its postings covered; throughput = postings/sec
  * through sort + block codec + parquet encode (the analog of Lucene's
  * IndexWriter flush stats / `IndexWriter.getFlushingBytes` telemetry).
  * Recorded via an accumulator, persisted as parquet next to the segment
  * ([[IndexStore.buildSegment]]) so a resumed build keeps the history. */
final case class TaskBuildMetric(
    stageId: Int,
    partitionId: Int,
    taskAttemptId: Long,
    nPostings: Long,
    nBlocks: Long,
    minDocId: Long,
    maxDocId: Long,
    elapsedMs: Long,
    postingsPerSec: Long)

/** Accumulator collecting per-task metric rows on the driver. Metrics are
  * observability, not data-plane: a retried task may record twice (standard
  * transformation-accumulator semantics) — consumers aggregate or dedup by
  * (stageId, partitionId, taskAttemptId). */
final class BuildMetricsAcc
    extends AccumulatorV2[TaskBuildMetric, Seq[TaskBuildMetric]] {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[TaskBuildMetric]()
  override def isZero: Boolean = buf.isEmpty
  override def copy(): BuildMetricsAcc = {
    val a = new BuildMetricsAcc
    a.buf.addAll(buf)
    a
  }
  override def reset(): Unit = buf.clear()
  override def add(v: TaskBuildMetric): Unit = buf.add(v)
  override def merge(other: AccumulatorV2[TaskBuildMetric, Seq[TaskBuildMetric]]): Unit =
    other match { case o: BuildMetricsAcc => buf.addAll(o.buf) }
  override def value: Seq[TaskBuildMetric] = buf.asScala.toSeq
}

object BuildMetrics {

  /** Wrap one encode partition: count postings + docId span on the way in,
    * blocks on the way out, and record exactly one metric row (empty tasks
    * record nothing) when the output iterator exhausts. */
  def metered(
      postings: Iterator[PostingRow],
      acc: BuildMetricsAcc,
      encode: Iterator[PostingRow] => Iterator[BlockRow]): Iterator[BlockRow] = {
    val t0 = System.nanoTime()
    var nPost = 0L
    var minD = Long.MaxValue
    var maxD = Long.MinValue
    val counted = postings.map { p =>
      nPost += 1
      if (p.docId < minD) minD = p.docId
      if (p.docId > maxD) maxD = p.docId
      p
    }
    val out = encode(counted)
    new Iterator[BlockRow] {
      private var nBlocks = 0L
      private var recorded = false
      override def hasNext: Boolean = {
        val h = out.hasNext
        if (!h && !recorded) {
          recorded = true
          if (nPost > 0) {
            val tc = TaskContext.get()
            val elapsedMs = math.max((System.nanoTime() - t0) / 1000000L, 1L)
            acc.add(TaskBuildMetric(
              if (tc == null) -1 else tc.stageId(),
              if (tc == null) -1 else tc.partitionId(),
              if (tc == null) -1L else tc.taskAttemptId(),
              nPost, nBlocks, minD, maxD, elapsedMs,
              nPost * 1000L / elapsedMs))
          }
        }
        h
      }
      override def next(): BlockRow = {
        val b = out.next()
        nBlocks += 1
        b
      }
    }
  }
}
