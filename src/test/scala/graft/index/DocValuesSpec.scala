package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fixtures.CodeCorpus
import graft.analysis.Analyzers

/** Numeric docvalues updates without reindexing
  * (`IndexWriter.updateNumericDocValue`, reference:
  * lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1803-1834). */
class DocValuesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dvtest-").toString
    IndexStore.buildAndCommit(
      spark.createDataset(CodeCorpus.files(40)), dir, IndexConfig(analyzer = Analyzers.simple))
    dir
  }

  private def dvMap(dir: String): Map[(Long, String), Long] =
    IndexStore.open(spark, dir).docValues.collect()
      .map(r => (r.docId, r.field) -> r.value).toMap

  test("base generation commits and reads back") {
    val dir = freshIndex()
    val base = (0L until 40L).map(i => DocValueRow(i, "pop", i * 10))
    IndexStore.updateNumericDocValues(spark, dir, spark.createDataset(base))
    val m = IndexStore.readManifest(dir).get
    assert(m.dvGen == 0L)
    assert(dvMap(dir) == base.map(r => (r.docId, r.field) -> r.value).toMap)
  }

  test("stacked updates: latest generation wins, untouched cells carry forward") {
    val dir = freshIndex()
    IndexStore.updateNumericDocValues(spark, dir,
      spark.createDataset((0L until 40L).map(i => DocValueRow(i, "pop", 1L)) ++
        (0L until 40L).map(i => DocValueRow(i, "stars", 5L))))
    IndexStore.updateNumericDocValues(spark, dir,
      spark.createDataset((0L until 40L by 4).map(i => DocValueRow(i, "pop", 2L))))
    IndexStore.updateNumericDocValues(spark, dir,
      spark.createDataset((0L until 40L by 8).map(i => DocValueRow(i, "pop", 3L))))
    val dv = dvMap(dir)
    (0L until 40L).foreach { i =>
      val expected = if (i % 8 == 0) 3L else if (i % 4 == 0) 2L else 1L
      assert(dv((i, "pop")) == expected, s"doc $i")
      assert(dv((i, "stars")) == 5L, s"doc $i stars must be untouched")
    }
    assert(IndexStore.readManifest(dir).get.dvGen == 2L)
  }

  test("point-in-time: a reader opened before an update keeps the old values") {
    val dir = freshIndex()
    IndexStore.updateNumericDocValues(spark, dir,
      spark.createDataset(Seq(DocValueRow(0L, "pop", 1L))))
    val oldReader = IndexStore.open(spark, dir)
    IndexStore.updateNumericDocValues(spark, dir,
      spark.createDataset(Seq(DocValueRow(0L, "pop", 99L))))
    assert(oldReader.docValues.collect().head.value == 1L)
    assert(IndexStore.open(spark, dir).docValues.collect().head.value == 99L)
  }
}
