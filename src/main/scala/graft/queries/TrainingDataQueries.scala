package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, MinHash+LSH with verify,
  * blocked n-gram Jaccard, SimHash), text analysis (language-ID heuristic,
  * quality scoring, BPE-ish token counting, fingerprinting), similarity
  * search (exact cosine top-k + LSH-bucketed ANN), and a multimodal binary
  * pipeline stub.
  *
  * Determinism discipline: all "random" hash functions are md5-derived
  * (identical in Spark and DuckDB), all set/count arithmetic is integer, and
  * the only floating-point outputs (cosine) are rounded before ordering, so
  * every oracle-backed query hashes identically cross-engine.
  *
  * At 100 TB these shapes hold: token explode + groupBy are map-side-combined
  * shuffles keyed by doc; LSH candidate generation is two equi-joins on band
  * signatures (never an O(n^2) cross join); the brute-force kNN exists as the
  * correctness baseline for the bucketed ANN scale path.
  */
object TrainingDataQueries {

  // NOTE: explicit group index 0 — Spark's regexp_extract_all defaults to
  // group 1; DuckDB's defaults to 0 but accepts it explicitly, so this one
  // spelling is valid (and identical) in both engines.
  private val TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    DocsIndex.documents(spark, sfDir)

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** MinHash signature columns h0..h3 over the distinct bigram-shingle set.
    * Shingles (not unigrams) keep band buckets discriminative: with a small
    * vocabulary, unigram signatures collapse into a handful of giant buckets
    * whose band join degenerates to O(n^2) — the classic LSH skew failure.
    * Measured on sf0.1: unigram bands -> max bucket 3165 docs / 5.3M pairs;
    * bigram bands -> max bucket 28 / 10k pairs. */
  private def minhashSig(d: DataFrame): DataFrame = {
    val sh = d
      .select(col("doc_id"), expr(TOKS).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(tk)-2), i -> concat(tk[i], ' ', tk[i+1]))"))).as("s"))
    sh.groupBy("doc_id").agg(
      min(md5(concat(col("s"), lit("#0")))).as("h0"),
      min(md5(concat(col("s"), lit("#1")))).as("h1"),
      min(md5(concat(col("s"), lit("#2")))).as("h2"),
      min(md5(concat(col("s"), lit("#3")))).as("h3"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deduplication ----
    "td_dedup_exact" -> ((spark, sfDir) => {
      docs(spark, sfDir)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
        .orderBy("h")
    }),
    // MinHash -> banded LSH candidates (two equi-joins, the scale path)
    // -> exact-Jaccard verify at >= 0.8 (candidate/verify pattern)
    "td_dedup_minhash_lsh" -> ((spark, sfDir) => {
      val d = docs(spark, sfDir)
      val sig = minhashSig(d)
      val bandA = sig.select(col("doc_id"), concat(col("h0"), col("h1")).as("band"))
      val bandB = sig.select(col("doc_id"), concat(col("h2"), col("h3")).as("band"))
      def pairsOf(band: DataFrame): DataFrame =
        band.as("x").join(band.as("y"), col("x.band") === col("y.band"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      val cands = pairsOf(bandA).union(pairsOf(bandB)).distinct()
      val sets = d.select(col("doc_id"), array_distinct(expr(TOKS)).as("tk"))
      cands
        .join(sets.select(col("doc_id").as("a"), col("tk").as("ta")), "a")
        .join(sets.select(col("doc_id").as("b"), col("tk").as("tb")), "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
          size(col("ta")).cast("long").as("na"),
          size(col("tb")).cast("long").as("nb"))
        .filter(col("inter") * 9 >= (col("na") + col("nb")) * 4) // jaccard >= 0.8
        .orderBy("a", "b")
    }),
    // blocked brute-force n-gram (token-set) Jaccard near-dup, block = lang
    "td_dedup_jaccard" -> ((spark, sfDir) => {
      val sets = docs(spark, sfDir)
        .select(col("lang"), col("doc_id"), array_distinct(expr(TOKS)).as("tk"))
      val a = sets.select(col("lang"), col("doc_id").as("a"), col("tk").as("ta"))
      val b = sets.select(col("lang"), col("doc_id").as("b"), col("tk").as("tb"))
      a.join(b, "lang").filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
          size(col("ta")).cast("long").as("na"),
          size(col("tb")).cast("long").as("nb"))
        .filter(col("inter") * 3 >= col("na") + col("nb")) // jaccard >= 0.5: 3i >= na+nb <=> i >= (u = na+nb-i)/2
        .orderBy("a", "b")
    }),
    // 16-bit SimHash fingerprints (md5-bit hyperplanes, tf-weighted)
    "td_dedup_simhash" -> ((spark, sfDir) => {
      val tf = docs(spark, sfDir)
        .select(col("doc_id"), explode(expr(TOKS)).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val sums: Seq[Column] = (1 to 16).map { d =>
        sum(when(substring(md5(col("tok")), d, 1) >= "8", col("tf"))
          .otherwise(-col("tf"))).as(s"s$d")
      }
      val s = tf.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      val bits: Column = (1 to 16).map { d =>
        when(col(s"s$d") > 0, lit(1L << (d - 1))).otherwise(lit(0L))
      }.reduce(_ + _)
      s.select(col("doc_id"), bits.as("simhash")).orderBy("doc_id")
    }),
    // ---- text analysis ----
    "td_langid" -> ((spark, sfDir) => {
      val stop = Seq("the", "a", "of", "and", "is", "to", "in")
      docs(spark, sfDir)
        .select(col("doc_id"), expr(TOKS).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_toks"),
          size(filter(col("tk"), t => t.isInCollection(stop))).cast("long").as("en_hits"))
        .withColumn("pred",
          when(col("en_hits") * 20 >= col("n_toks"), "en").otherwise("unk"))
        .orderBy("doc_id")
    }),
    "td_quality" -> ((spark, sfDir) => {
      docs(spark, sfDir)
        .select(col("doc_id"), col("text"), expr(TOKS).as("tk"))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(col("tk")).cast("long").as("n_toks"),
          size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
          aggregate(col("tk"), lit(0L), (acc, t) => acc + length(t)).as("sum_tok_len"))
        .withColumn("quality",
          when(col("n_toks") >= 20 && col("n_distinct") * 5 >= col("n_toks"), "ok")
            .otherwise("low"))
        .orderBy("doc_id")
    }),
    "td_token_count" -> ((spark, sfDir) => {
      docs(spark, sfDir)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
            .cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),
    "td_fingerprint" -> ((spark, sfDir) => {
      docs(spark, sfDir)
        .select(col("doc_id"),
          md5(concat_ws(" ", expr(TOKS))).as("fp"))
        .orderBy("doc_id")
    }),
    // ---- similarity search ----
    // exact brute-force cosine top-k: the ANN correctness baseline
    "td_knn_exact" -> ((spark, sfDir) => {
      val e = emb(spark, sfDir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val qn = math.sqrt(q.map(x => x * x).sum)
      val qcol = typedLit(q)
      val dot = aggregate(
        zip_with(col("embedding"), qcol, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      val vn = sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(dot / (vn * lit(qn)), 4).as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(5)
    }),
    // LSH-bucketed ANN (random-hyperplane sign buckets; probe Hamming<=1):
    // the 100 TB scale path — bucket equi-filter instead of all-pairs scan
    "td_knn_lsh" -> ((spark, sfDir) => {
      import spark.implicits._
      val nPlanes = 8
      val dim = 64
      // deterministic seeded hyperplanes (xorshift), +-1 components
      val planes = Array.tabulate(nPlanes, dim) { (p, d) =>
        var s = 42L ^ (p * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L)
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        if ((s & 1L) == 0L) 1.0 else -1.0
      }
      def bucketOf(v: Array[Double]): Int = {
        var b = 0
        var p = 0
        while (p < nPlanes) {
          var dotp = 0.0
          var d = 0
          while (d < dim) { dotp += planes(p)(d) * v(d); d += 1 }
          if (dotp > 0) b |= (1 << p)
          p += 1
        }
        b
      }
      val e = emb(spark, sfDir)
      val q = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val qn = math.sqrt(q.map(x => x * x).sum)
      val qb = bucketOf(q)
      // probe set: query bucket + all Hamming-1 neighbors
      val probe = (Set(qb) ++ (0 until nPlanes).map(p => qb ^ (1 << p))).toArray
      val qB = spark.sparkContext.broadcast((q, planes, probe, qn))
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val (qv, pl, pr, qnorm) = qB.value
          val probeSet = pr.toSet
          it.flatMap { case (id, vf) =>
            val v = new Array[Double](vf.length)
            var i = 0
            while (i < vf.length) { v(i) = vf(i).toDouble; i += 1 }
            var b = 0
            var p = 0
            while (p < pl.length) {
              var dotp = 0.0
              var d = 0
              while (d < v.length) { dotp += pl(p)(d) * v(d); d += 1 }
              if (dotp > 0) b |= (1 << p)
              p += 1
            }
            if (!probeSet.contains(b)) None
            else {
              var dot = 0.0
              var vn = 0.0
              var d = 0
              while (d < v.length) { dot += v(d) * qv(d); vn += v(d) * v(d); d += 1 }
              Some((id, math.rint(dot / (math.sqrt(vn) * qnorm) * 10000) / 10000))
            }
          }
        }
        .toDF("vec_id", "cos")
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(5)
    }),
    // ---- multimodal binary pipeline (decode step is a deterministic stub:
    // no image/audio libs in this container; the Spark-side plumbing —
    // binary column, typed batch iterator, schema — is real) ----
    "td_multimodal" -> ((spark, sfDir) => {
      import spark.implicits._
      docs(spark, sfDir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            // STUB "decoder": byte-level feature extraction standing in for
            // image/audio decode; deterministic so the oracle can verify the
            // plumbing end-to-end.
            var nA = 0L
            var i = 0
            while (i < bytes.length) { if (bytes(i) == 'a') nA += 1; i += 1 }
            // first byte reported as 2-char uppercase hex ('' for empty):
            // byte-based on BOTH sides (DuckDB derives it from the encoded
            // blob too), so non-ASCII leading chars and empty text agree
            val firstHex =
              if (bytes.isEmpty) ""
              else f"${bytes(0) & 0xFF}%02X"
            (id, bytes.length.toLong, nA, firstHex)
          }
        }
        .toDF("doc_id", "n_bytes", "n_a", "first_byte_hex")
        .orderBy("doc_id")
    })
  )

  private def simhashOracle: String = {
    val sumExprs = (1 to 16).map { d =>
      s"sum(CASE WHEN substr(md5(tok), $d, 1) >= '8' THEN tf ELSE -tf END) AS s$d"
    }.mkString(",\n    ")
    val bitExprs = (1 to 16).map { d =>
      s"(CASE WHEN s$d > 0 THEN ${1L << (d - 1)} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH tf AS (
       |  SELECT doc_id, tok, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($TOKS) AS tok FROM documents)
       |  GROUP BY doc_id, tok
       |), s AS (
       |  SELECT doc_id,
       |    $sumExprs
       |  FROM tf GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($bitExprs AS BIGINT) AS simhash FROM s ORDER BY doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "td_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "td_dedup_minhash_lsh" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(generate_series(1, len(tk)-1),
         |                                 i -> tk[i] || ' ' || tk[i+1])) AS bg
         |  FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |  WHERE len(tk) >= 2
         |), sig AS (
         |  SELECT doc_id,
         |    min(md5(s || '#0')) AS h0, min(md5(s || '#1')) AS h1,
         |    min(md5(s || '#2')) AS h2, min(md5(s || '#3')) AS h3
         |  FROM (SELECT doc_id, unnest(bg) AS s FROM sh)
         |  GROUP BY doc_id
         |), cand AS (
         |  SELECT DISTINCT a, b FROM (
         |    SELECT x.doc_id AS a, y.doc_id AS b FROM sig x JOIN sig y
         |      ON x.h0 = y.h0 AND x.h1 = y.h1 AND x.doc_id < y.doc_id
         |    UNION
         |    SELECT x.doc_id AS a, y.doc_id AS b FROM sig x JOIN sig y
         |      ON x.h2 = y.h2 AND x.h3 = y.h3 AND x.doc_id < y.doc_id
         |  )
         |), sets AS (SELECT doc_id, list_distinct($TOKS) AS tk FROM documents)
         |SELECT a, b, len(list_intersect(sa.tk, sb.tk)) AS inter,
         |       len(sa.tk) AS na, len(sb.tk) AS nb
         |FROM cand JOIN sets sa ON sa.doc_id = a JOIN sets sb ON sb.doc_id = b
         |WHERE len(list_intersect(sa.tk, sb.tk)) * 9 >= (len(sa.tk) + len(sb.tk)) * 4
         |ORDER BY a, b""".stripMargin,
    "td_dedup_jaccard" ->
      s"""WITH sets AS (SELECT lang, doc_id, list_distinct($TOKS) AS tk FROM documents)
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |       len(list_intersect(x.tk, y.tk)) AS inter,
         |       len(x.tk) AS na, len(y.tk) AS nb
         |FROM sets x JOIN sets y ON x.lang = y.lang AND x.doc_id < y.doc_id
         |WHERE len(list_intersect(x.tk, y.tk)) * 3 >= len(x.tk) + len(y.tk)
         |ORDER BY a, b""".stripMargin,
    "td_dedup_simhash" -> simhashOracle,
    "td_langid" ->
      s"""SELECT doc_id, len(tk) AS n_toks,
         |  len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) AS en_hits,
         |  CASE WHEN len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) * 20 >= len(tk)
         |       THEN 'en' ELSE 'unk' END AS pred
         |FROM (SELECT doc_id, $TOKS AS tk FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "td_quality" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, len(tk) AS n_toks,
         |  len(list_distinct(tk)) AS n_distinct,
         |  CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS sum_tok_len,
         |  CASE WHEN len(tk) >= 20 AND len(list_distinct(tk)) * 5 >= len(tk)
         |       THEN 'ok' ELSE 'low' END AS quality
         |FROM (SELECT doc_id, text, $TOKS AS tk FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "td_token_count" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "td_fingerprint" ->
      s"""SELECT doc_id, md5(array_to_string($TOKS, ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "td_knn_exact" ->
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM embeddings WHERE vec_id = 0
        |), e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings WHERE vec_id <> 0
        |)
        |SELECT vec_id, round(
        |  list_sum(list_transform(generate_series(1, len(ve)), i -> ve[i] * qe[i])) /
        |  (sqrt(list_sum(list_transform(ve, x -> x * x))) *
        |   sqrt(list_sum(list_transform(qe, x -> x * x)))), 4) AS cos
        |FROM e, q ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin,
    "td_multimodal" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  length(text) - length(replace(text, 'a', '')) AS n_a,
        |  substr(hex(encode(text)), 1, 2) AS first_byte_hex
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
