package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DocsIndex, FulltextQueries, GraphQueries, RelationalQueries, TrainingDataQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` spans three families (each key has a DuckDB oracle in
  * [[oracleSql]] unless its semantics are not SQL-expressible, in which case
  * the scalatest suite carries the correctness burden):
  *  - `ft_*`   fulltext engine: posting blocks, term stats, boolean/phrase/
  *             prefix match sets, BM25 block-max top-k (SURVEY.md §2.2-2.5)
  *  - `q_*`    relational/facet/streaming-expression operators
  *             (SURVEY.md §2.6-2.7)
  *  - `td_*`   training-data pipeline: dedup (exact/MinHash-LSH/Jaccard/
  *             SimHash), text analysis, similarity search, multimodal stub
  */
object SparkEntry {

  /** Flagship: BM25 top-10 for a boolean query over the sf0.001 documents
    * corpus through the full index + block-max WAND path. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val (index, searcher) = DocsIndex.get(spark, sfDir)
    import org.apache.spark.sql.functions._
    searcher.searchDS(searcher.parse("spark AND (query OR table)"), 10).toDF()
      .join(DocsIndex.docIdMap(index), "docId")
      .orderBy(desc("score"), asc("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FulltextQueries.queries ++ RelationalQueries.queries ++ TrainingDataQueries.queries ++
      GraphQueries.queries

  def oracleSql: Map[String, String] =
    FulltextQueries.oracleSql ++ RelationalQueries.oracleSql ++ TrainingDataQueries.oracleSql ++
      GraphQueries.oracleSql
}
