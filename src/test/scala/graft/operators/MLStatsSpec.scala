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
    // click: 0.01, 0.02, 0.03 ; view: 0.02, 0.04  (cents 1,2,3 vs 2,4)
    Seq(
      (1L, "click", 0.011), (2L, "click", 0.021), (3L, "click", 0.031),
      (4L, "view", 0.021), (5L, "view", 0.041))
      .toDF("event_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q_mannwhitney matches the hand-computed tie-averaged U") {
    // pooled cents sorted: 1(A) 2(A) 2(B) 3(A) 4(B); ranks 1, 2.5, 2.5, 4, 5
    // sumRank_A = 7.5 -> U1 = 7.5 - 3*4/2 = 1.5, U2 = 3*2 - 1.5 = 4.5
    // commons-math mannWhitneyU returns max(U1, U2) = 4.5
    val r = SparkEntry.queries("q_mannwhitney")(spark, eventsDir).head()
    assert(r.getAs[Long]("n1") === 3L)
    assert(r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("u_stat") === 4.5)
  }

  test("q_ks matches the hand-computed sup-ECDF D") {
    // ECDF_A at v=1: 1/3, v=2: 2/3, v=3: 1, v=4: 1
    // ECDF_B at v=1: 0,   v=2: 1/2, v=3: 1/2, v=4: 1
    // gaps: 1/3, 1/6, 1/2, 0 -> D = 1/2
    val r = SparkEntry.queries("q_ks")(spark, eventsDir).head()
    assert(r.getAs[Long]("num") === 3L) // |cumA*n2 - cumB*n1| max = |3*2-1*3|=3
    assert(r.getAs[Double]("d_stat") === 0.5)
  }

  test("q_outliers keeps exactly the tuples outside the CDF band") {
    // mean cents = (1+2+3+2+4)/5 = 2.4; CDF(x) = 1 - exp(-x/2.4)
    // CDF(1)=.341 CDF(2)=.565 CDF(3)=.713 CDF(4)=.811 — none outside
    // [0.01, 0.99] -> empty result on this fixture
    val n = SparkEntry.queries("q_outliers")(spark, eventsDir).count()
    assert(n === 0L)
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
