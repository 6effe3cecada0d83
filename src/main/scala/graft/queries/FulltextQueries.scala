package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.codec.{Impact, PostingsCodec}
import graft.index.BlockRow

/** Fulltext-engine queries for the driver contract: every result is produced
  * by the REAL index/search path (posting blocks, BM25, WAND, phrase
  * positions) and — where token semantics are SQL-expressible — verified by a
  * DuckDB oracle that recomputes the same answer from the raw text with
  * `regexp_extract_all(lower(text), '[a-z0-9]+')`.
  *
  * BM25-scored top-k queries ship without an oracle (Float-exact Lucene
  * scoring is not expressible in DuckDB's double arithmetic); their
  * correctness is covered by the scalatest differential suite
  * (pruned WAND vs exhaustive Float oracle, SearchSpec).
  */
object FulltextQueries {

  private val TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  private def hitsDF(spark: SparkSession, sfDir: String, q: String, k: Int): DataFrame = {
    val (index, searcher) = DocsIndex.get(spark, sfDir)
    searcher.searchDS(searcher.parse(q), k).toDF()
      .join(DocsIndex.docIdMap(index), "docId")
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score"))
  }

  private def matchDF(spark: SparkSession, sfDir: String, q: String): DataFrame = {
    val (index, searcher) = DocsIndex.get(spark, sfDir)
    searcher.matchesDS(searcher.parse(q)).toDF("docId")
      .join(DocsIndex.docIdMap(index), "docId")
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- index internals, oracle-verified at the token level ----
    "ft_postings_tf" -> ((spark, sfDir) => {
      import spark.implicits._
      val (index, _) = DocsIndex.get(spark, sfDir)
      val terms = Seq("spark", "query", "vector")
      val decoded = index.blocks.filter($"term".isin(terms: _*)).as[BlockRow]
        .flatMap { b =>
          val eb = graft.codec.EncodedBlock(b.count, b.firstDocId, b.lastDocId,
            b.blockTtf, b.docsEnc, b.freqsEnc, b.normsEnc, b.posEnc,
            b.impactFreqs.zip(b.impactNorms).map { case (f, n) => Impact(f, n) })
          val docs = PostingsCodec.decodeDocs(eb)
          val freqs = PostingsCodec.decodeFreqs(eb)
          docs.indices.iterator.map(i => (b.term, docs(i), freqs(i).toLong))
        }.toDF("term", "docId", "tf")
      decoded.join(DocsIndex.docIdMap(index), "docId")
        .select($"term", $"doc_id", $"tf")
        .orderBy("term", "doc_id")
    }),
    "ft_term_stats" -> ((spark, sfDir) => {
      import spark.implicits._
      val (index, _) = DocsIndex.get(spark, sfDir)
      val terms = Seq("spark", "query", "vector", "customer", "window")
      index.termStats.filter($"term".isin(terms: _*))
        .select($"term", $"docFreq".as("doc_freq"), $"totalTermFreq".as("total_term_freq"))
        .orderBy("term")
    }),
    "ft_doc_len" -> ((spark, sfDir) => {
      val (index, _) = DocsIndex.get(spark, sfDir)
      index.docs.toDF()
        .join(DocsIndex.docIdMap(index), "docId")
        .select(col("doc_id"), col("len").cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),
    "ft_top_terms" -> ((spark, sfDir) => {
      import spark.implicits._
      val (index, _) = DocsIndex.get(spark, sfDir)
      index.termStats
        .select($"term", $"docFreq".as("doc_freq"))
        .orderBy(desc("doc_freq"), asc("term"))
        .limit(20)
    }),
    // ---- boolean / phrase / prefix match sets (exact, oracle-verified) ----
    "ft_match_and" -> ((spark, sfDir) => matchDF(spark, sfDir, "spark AND vector AND hash")),
    "ft_match_or" -> ((spark, sfDir) => matchDF(spark, sfDir, "vector OR customer")),
    "ft_match_not" -> ((spark, sfDir) => matchDF(spark, sfDir, "spark NOT vector")),
    "ft_match_phrase" -> ((spark, sfDir) => matchDF(spark, sfDir, "\"big table\"")),
    "ft_match_prefix" -> ((spark, sfDir) => matchDF(spark, sfDir, "cust*")),
    "ft_match_wildcard" -> ((spark, sfDir) => matchDF(spark, sfDir, "w?ndow")),
    // minShouldMatch >= 2 of 3 (MinShouldMatchSumScorer analog) — AST-built
    "ft_match_msm" -> ((spark, sfDir) => {
      val (index, searcher) = DocsIndex.get(spark, sfDir)
      val q = graft.search.BoolQ(
        should = Seq(graft.search.TermQ("vector"), graft.search.TermQ("customer"),
          graft.search.TermQ("hash")),
        minShouldMatch = 2)
      searcher.matchesDS(q).toDF("docId")
        .join(DocsIndex.docIdMap(index), "docId")
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // facet over a search match set (Solr FacetModule applies facets to the
    // query result, not the raw table): lang buckets of the OR match set
    "ft_facet_lang" -> ((spark, sfDir) => {
      val (index, searcher) = DocsIndex.get(spark, sfDir)
      searcher.matchesDS(searcher.parse("vector OR customer")).toDF("docId")
        .join(index.docs.toDF().select(col("docId"), col("lang")), "docId")
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang")
    }),
    // sort-by-field over search hits (TopFieldCollector: rank the match set
    // by a doc-value column instead of BM25 — longest matching docs first)
    "ft_sort_field" -> ((spark, sfDir) => {
      val (index, searcher) = DocsIndex.get(spark, sfDir)
      searcher.matchesDS(searcher.parse("spark AND vector")).toDF("docId")
        .join(index.docs.toDF().select(col("docId"), col("len")), "docId")
        .join(DocsIndex.docIdMap(index), "docId")
        .orderBy(desc("len"), asc("doc_id"))
        .limit(10)
        .select(col("doc_id"), col("len").cast("long").as("n_tokens"))
    }),
    // ---- BM25 top-k through block-max pruning (differential-tested) ----
    "ft_search_term" -> ((spark, sfDir) => hitsDF(spark, sfDir, "vector", 10)),
    "ft_search_bool" -> ((spark, sfDir) => hitsDF(spark, sfDir, "(table OR vector) AND batch", 10)),
    "ft_search_phrase" -> ((spark, sfDir) => hitsDF(spark, sfDir, "\"big table\" OR customer", 10)),
    // SynonymQuery: terms scored as one pseudo-term
    "ft_search_synonym" -> ((spark, sfDir) => {
      val (index, searcher) = DocsIndex.get(spark, sfDir)
      val q = graft.search.SynonymQ(Seq("spark", "query"))
      searcher.searchDS(q, 10).toDF()
        .join(DocsIndex.docIdMap(index), "docId")
        .orderBy(desc("score"), asc("doc_id")).limit(10)
        .select(col("doc_id"), col("score"))
    }),
    // searchAfter pagination: page 2 of the 'vector' ranking
    "ft_search_after" -> ((spark, sfDir) => {
      val (index, searcher) = DocsIndex.get(spark, sfDir)
      val q = searcher.parse("vector")
      val page1 = searcher.search(q, 10)
      val after = page1.last
      searcher.searchDS(q, 10, after).toDF()
        .join(DocsIndex.docIdMap(index), "docId")
        .orderBy(desc("score"), asc("doc_id")).limit(10)
        .select(col("doc_id"), col("score"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ft_postings_tf" ->
      s"""SELECT * FROM (
         |  SELECT t.term AS term, d.doc_id AS doc_id,
         |         len(list_filter($TOKS, x -> x = t.term)) AS tf
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(['spark','query','vector']) AS term) t
         |) WHERE tf > 0 ORDER BY term, doc_id""".stripMargin,
    "ft_term_stats" ->
      s"""SELECT tok AS term, count(*) AS doc_freq, CAST(sum(tf) AS BIGINT) AS total_term_freq
         |FROM (
         |  SELECT doc_id, tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($TOKS) AS tok FROM documents)
         |  GROUP BY doc_id, tok
         |)
         |WHERE tok IN ('spark','query','vector','customer','window')
         |GROUP BY tok ORDER BY term""".stripMargin,
    "ft_doc_len" ->
      s"SELECT doc_id, len($TOKS) AS n_tokens FROM documents ORDER BY doc_id",
    "ft_top_terms" ->
      s"""SELECT tok AS term, count(*) AS doc_freq
         |FROM (SELECT doc_id, unnest(list_distinct($TOKS)) AS tok FROM documents)
         |GROUP BY tok ORDER BY doc_freq DESC, term LIMIT 20""".stripMargin,
    "ft_match_and" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |WHERE list_contains(tk, 'spark') AND list_contains(tk, 'vector') AND list_contains(tk, 'hash')
         |ORDER BY doc_id""".stripMargin,
    "ft_match_or" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |WHERE list_contains(tk, 'vector') OR list_contains(tk, 'customer')
         |ORDER BY doc_id""".stripMargin,
    "ft_match_not" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |WHERE list_contains(tk, 'spark') AND NOT list_contains(tk, 'vector')
         |ORDER BY doc_id""".stripMargin,
    "ft_match_phrase" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(text), '(^|[^a-z0-9])big[^a-z0-9]+table([^a-z0-9]|$)')
        |ORDER BY doc_id""".stripMargin,
    "ft_match_prefix" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |WHERE len(list_filter(tk, x -> x LIKE 'cust%')) > 0
         |ORDER BY doc_id""".stripMargin,
    "ft_match_wildcard" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |WHERE len(list_filter(tk, x -> regexp_matches(x, '^w.ndow$$'))) > 0
         |ORDER BY doc_id""".stripMargin,
    "ft_facet_lang" ->
      s"""SELECT lang, count(*) AS cnt
         |FROM (SELECT lang, $TOKS AS tk FROM documents)
         |WHERE list_contains(tk, 'vector') OR list_contains(tk, 'customer')
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "ft_sort_field" ->
      s"""SELECT doc_id, n_tokens FROM
         |  (SELECT doc_id, $TOKS AS tk, len($TOKS) AS n_tokens FROM documents)
         |WHERE list_contains(tk, 'spark') AND list_contains(tk, 'vector')
         |ORDER BY n_tokens DESC, doc_id LIMIT 10""".stripMargin,
    "ft_match_msm" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |WHERE (CASE WHEN list_contains(tk, 'vector') THEN 1 ELSE 0 END)
         |    + (CASE WHEN list_contains(tk, 'customer') THEN 1 ELSE 0 END)
         |    + (CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END) >= 2
         |ORDER BY doc_id""".stripMargin
  )
}
