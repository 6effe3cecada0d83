package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Semantics pins for the session's Solr math evaluators and ML streams:
  * hand-computed Mann-Whitney / KS fixtures (commons-math conventions:
  * tie-averaged ranks, U = max(U1, U2); D = sup ECDF gap) and a
  * differential batch-GD logistic-regression reference for the `train`
  * stream's deterministic rendering. */
class MLStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Write a minimal fixture dir holding an events table usable by the
    * q_mannwhitney / q_ks / q_outliers queries. Values are exact cents. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mlstats").toString
    import spark.implicits._
    // click cents: 1, 2, 3 (users u1,u1,u2; days 1,1,2)
    // view  cents: 2, 4, 5 (users u1,u3,u2; days 1,2,3)
    Seq(
      (1L, "click", 0.011, "2024-01-01 10:00:00", "u1"),
      (2L, "click", 0.021, "2024-01-01 11:00:00", "u1"),
      (3L, "click", 0.031, "2024-01-02 10:00:00", "u2"),
      (4L, "view", 0.021, "2024-01-01 12:00:00", "u1"),
      (5L, "view", 0.041, "2024-01-02 13:00:00", "u3"),
      (6L, "view", 0.051, "2024-01-03 09:00:00", "u2"))
      .toDF("event_id", "event_type", "value", "ts_s", "user_id")
      .selectExpr("event_id", "event_type", "value",
        "CAST(ts_s AS TIMESTAMP) AS ts", "user_id")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q_mannwhitney matches the hand-computed tie-averaged U") {
    // pooled sorted: 1A 2A 2B 3A 4B 5B; ranks 1, 2.5, 2.5, 4, 5, 6
    // sumRank_A = 7.5 -> U1 = 7.5 - 3*4/2 = 1.5, U2 = 9 - 1.5 = 7.5
    // commons-math mannWhitneyU returns max(U1, U2) = 7.5
    val r = SparkEntry.queries("q_mannwhitney")(spark, eventsDir).head()
    assert(r.getAs[Long]("n1") === 3L)
    assert(r.getAs[Long]("n2") === 3L)
    assert(r.getAs[Double]("u_stat") === 7.5)
  }

  test("q_ks matches the hand-computed sup-ECDF D") {
    // ECDF gaps peak at v=3: |ECDF_A=1 − ECDF_B=1/3| = 2/3
    // integer numerator: |cumA·n2 − cumB·n1| = |3·3 − 1·3| = 6
    val r = SparkEntry.queries("q_ks")(spark, eventsDir).head()
    assert(r.getAs[Long]("num") === 6L)
    assert(math.abs(r.getAs[Double]("d_stat") - 2.0 / 3.0) < 1e-12)
  }

  test("q_outliers keeps exactly the tuples outside the CDF band") {
    // mean cents = 17/6 ≈ 2.833; CDF range on cents 1..5 is [0.30, 0.83]
    // — none outside [0.01, 0.99] -> empty result on this fixture
    val n = SparkEntry.queries("q_outliers")(spark, eventsDir).count()
    assert(n === 0L)
  }

  test("q_paired_ttest matches the hand-computed paired t") {
    // paired users: u1 d = (1+2) − 2 = 1; u2 d = 3 − 5 = −2 (u3 unpaired)
    // n=2, s=−1, q=5: t = (−0.5)/sqrt(((5 − 0.5)/1)/2) = −1/3
    val r = SparkEntry.queries("q_paired_ttest")(spark, eventsDir).head()
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("t_stat") === -0.3333)
  }

  test("q_emd matches the hand-computed prefix-sum EMD") {
    // daily a−b: d1: 2−1=1, d2: 1−1=0, d3: 0−1=−1; prefixes 1,1,0 -> EMD 2
    val r = SparkEntry.queries("q_emd")(spark, eventsDir).head()
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Long]("emd") === 2L)
  }

  /** docs fixture for the ML streams: two langs, feature terms with
    * varying tf so the idf·(1+ln tf) encoding is exercised. */
  private lazy val docsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mldocs").toString
    import spark.implicits._
    val rows = Seq(
      (0L, "data data hash alpha", "en"),
      (1L, "data join beta", "en"),
      (2L, "hash hash hash gamma", "en"),
      (3L, "data delta", "de"),
      (4L, "join join epsilon", "de"),
      (5L, "zeta eta", "de"), // no feature term: excluded from train vectors
      (6L, "data hash join", "en"))
    rows.map { case (id, text, lang) => (id, text, lang, "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("td_train_logit equals an independent scalar batch-GD reference") {
    val r = SparkEntry.queries("td_train_logit")(spark, docsDir).head()
    // independent reference: same quantization contract, plain Scala
    val n = 7.0
    val texts = Seq(
      (Seq("data", "data", "hash", "alpha"), 1.0),
      (Seq("data", "join", "beta"), 1.0),
      (Seq("hash", "hash", "hash", "gamma"), 1.0),
      (Seq("data", "delta"), 0.0),
      (Seq("join", "join", "epsilon"), 0.0),
      (Seq("zeta", "eta"), 0.0),
      (Seq("data", "hash", "join"), 1.0))
    val terms = Seq("data", "hash", "join")
    val dfs = terms.map(t => t -> texts.count(_._1.contains(t))).toMap
    val idfq = terms.map(t => math.floor(math.log(n / (dfs(t) + 1)) * 1e6) / 1e6)
    val vecs = texts.flatMap { case (toks, y) =>
      val x = terms.zip(idfq).map { case (t, i) =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0.0 else math.floor(i * (1 + math.log(tf.toDouble)) * 1e6) / 1e6
      }
      if (x.forall(_ == 0.0)) None else Some((1.0 +: x, y))
    }
    var w = Array(1.0, 1.0, 1.0, 1.0)
    for (_ <- 1 to 3) {
      val g = Array.fill(4)(0L)
      for ((x, y) <- vecs) {
        val z = w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3)
        val sig = 1.0 / (1.0 + math.exp(-z))
        for (j <- 0 to 3) g(j) += math.floor((sig - y) * x(j) * 1e8).toLong
      }
      w = w.indices.map(j => w(j) - 0.01 * (g(j).toDouble / 1e8)).toArray
    }
    assert(r.getAs[Long]("n_docs") === vecs.size.toLong)
    for (j <- 0 to 3) {
      // engine rounds to 6 decimals; compare the unrounded trajectory at
      // half-ulp-of-round tolerance (cross-engine bit-equality is pinned by
      // the DuckDB oracle, not here)
      assert(math.abs(r.getAs[Double](s"w${j}_r") - w(j)) <= 1e-6,
        s"w$j: got ${r.getAs[Double](s"w${j}_r")}, want ~${w(j)}")
    }
    val errRef = vecs.map { case (x, y) =>
      val z = w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3)
      math.floor(math.abs(1.0 / (1.0 + math.exp(-z)) - y) * 1e8).toLong
    }.sum
    assert(r.getAs[Long]("error_micro8") === errRef)
  }

  test("td_feature_select ranks a perfectly-separating term first") {
    val r = SparkEntry.queries("td_feature_select")(spark, docsDir)
      .collect().map(x => (x.getAs[String]("term"), x.getAs[Double]("score_r")))
    assert(r.nonEmpty)
    // scores are sorted descending and within [0, ln 2]
    assert(r.map(_._2).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    assert(r.forall(x => x._2 >= -1e-9 && x._2 <= math.log(2.0) + 1e-9))
  }

  test("td_dbscan recovers the planted chain + blob geometry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dbscan").toString
    import spark.implicits._
    // chain 0—1—2—3 at x = 0, 0.5, 1.0, 1.5 (spacing 500 mills, eps 1150):
    //   0 has neighbors {1,2} (2 < minPts=3)  -> border
    //   1 has {0,2,3}, 2 has {0,1,3}          -> cores, one component
    //   3 has neighbors {1,2}                 -> border
    // blob 4..7 at x≈10: all 4 mutually within eps -> cores, cluster 4
    // 8 at x=5: no neighbors -> noise (absent from the result)
    val vecs = Seq(
      (0L, Array(0.0f, 0f, 0f, 0f)), (1L, Array(0.5f, 0f, 0f, 0f)),
      (2L, Array(1.0f, 0f, 0f, 0f)), (3L, Array(1.5f, 0f, 0f, 0f)),
      (4L, Array(10.0f, 0f, 0f, 0f)), (5L, Array(10.0f, 0.1f, 0f, 0f)),
      (6L, Array(10.1f, 0f, 0f, 0f)), (7L, Array(10.1f, 0.1f, 0f, 0f)),
      (8L, Array(5.0f, 0f, 0f, 0f)))
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0L))
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("td_dbscan")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("is_core"))).toSet
    val want = Set(
      (0L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L),
      (4L, 4L, 1L), (5L, 4L, 1L), (6L, 4L, 1L), (7L, 4L, 1L))
    assert(got === want)
  }

  test("q_fft DC bin is the exact series sum; spectrum is conjugate-symmetric") {
    val rows = SparkEntry.queries("q_fft")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("re_micro6"), r.getAs[Long]("im_micro6")))
      .sortBy(_._1)
    assert(rows.length === 32)
    // k = 0: cos = 1 exactly, sin = 0 exactly -> re = 1e6·Σx, im = 0
    val (dcRe, dcIm) = (rows(0)._2, rows(0)._3)
    assert(dcRe % 1000000L === 0L && dcRe > 0L)
    assert(dcIm === 0L)
    // real input: X_{N−k} = conj(X_k) up to one floor ulp per term (≤ 32 micro)
    for (k <- 1 until 16) {
      val (_, reK, imK) = rows(k)
      val (_, reN, imN) = rows(32 - k)
      assert(math.abs(reK - reN) <= 64, s"re symmetry at k=$k: $reK vs $reN")
      assert(math.abs(imK + imN) <= 64, s"im symmetry at k=$k: $imK vs ${imN}")
    }
  }

  test("q_finddelay matches the hand-computed cross-correlation argmax") {
    // hourly buckets on the fixture (6 distinct hours, all < 24 kept):
    // clicks x = [1,1,0,1,0,0], views y = [0,0,1,0,1,1] by hour rank
    // conv[idx] = Σ x_k·y_m at idx = k + (23 − m); the single best |c| is
    // verified against a scalar reference loop below
    val r = SparkEntry.queries("q_finddelay")(spark, eventsDir).head()
    val x = Array(1L, 1L, 0L, 1L, 0L, 0L)
    val y = Array(0L, 0L, 1L, 0L, 1L, 1L)
    val conv = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (k <- x.indices; m <- y.indices) conv(k + (23L - m)) += x(k) * y(m)
    val (bestIdx, bestAbs) = conv.toSeq.map { case (i, c) => (i, math.abs(c)) }
      .sortBy { case (i, a) => (-a, i) }.head
    assert(r.getAs[Long]("delay") === bestIdx + 1 - 24)
    assert(r.getAs[Long]("max_abs") === bestAbs)
  }

  test("q_akima equals a scalar Akima+Hermite reference on the real series") {
    val rows = SparkEntry.queries("q_akima")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("n") -> r.getAs[Double]("mid_r")).toMap
    // scalar reference from the same hourly series
    val hours = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("event_type") === "click")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x")).orderBy("h")
      .collect().map(_.getLong(1))
    val m = hours.sliding(2).map(p => p(1) - p(0)).toArray
    def t(i: Int): Double = {
      val w1 = math.abs(m(i + 1) - m(i)); val w2 = math.abs(m(i - 1) - m(i - 2))
      if (w1 + w2 == 0) (m(i - 1) + m(i)) / 2.0
      else (w1.toDouble * m(i - 1) + w2.toDouble * m(i)) / (w1 + w2)
    }
    assert(rows.nonEmpty)
    for (i <- 2 until hours.length - 3) {
      val mid = 0.5 * hours(i) + 0.125 * t(i) + 0.5 * hours(i + 1) - 0.125 * t(i + 1)
      assert(math.abs(rows(i.toLong) - mid) <= 1e-4, s"interval $i")
    }
  }

  test("ft_payload_score payload reductions respect the decoder range") {
    val rows = SparkEntry.queries("ft_payload_score")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx, sm, av) = (r.getAs[Double]("p_min"), r.getAs[Double]("p_max"),
        r.getAs[Double]("p_sum"), r.getAs[Double]("p_avg"))
      val tf = r.getAs[Long]("tf")
      assert(mn >= 1.0 && mx <= 11.0 && mn <= mx)
      assert(sm >= mn * tf - 1e-9 && sm <= mx * tf + 1e-9)
      assert(av >= mn - 1e-9 && av <= mx + 1e-9)
    }
  }
}
