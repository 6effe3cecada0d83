package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fixtures.CodeCorpus
import graft.index._

/** Pluggable Similarity (IndexSearcher.setSimilarity analog): formula
  * goldens per model + differential (pruned distributed top-k vs exhaustive
  * brute force) under each non-default similarity. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val files = CodeCorpus.files(400)
  private lazy val index = IndexBuilder.build(
    spark.createDataset(files), IndexConfig(numPartitions = 4, saltSpan = 128))
  private lazy val base = new GraftSearcher(index)

  private val stats = CollectionStats(docCount = 1000, sumTotalTermFreq = 50000)

  test("ClassicSim formula: idf = ln((n+1)/(df+1)) + 1, tf = sqrt(freq), norm = 1/sqrt(dl)") {
    // norm byte for dl=16 decodes back to 16 (exact below 24)
    val nb = Bm25.encodeNorm(16) & 0xFF
    val s = ClassicSim.doubleScorer(1.0, df = 9, ttf = 20, stats)
    val expected = (math.log(1001.0 / 10.0) + 1) * math.sqrt(4.0) / math.sqrt(16.0)
    assert(math.abs(s.score(4.0, nb) - expected) < 1e-12)
    // float path agrees with double within float tolerance
    val f = ClassicSim.scorer(1f, 9, 20, stats)
    assert(math.abs(f.score(4f, nb) - expected) < 1e-6)
    assert(f.maxScore == Float.PositiveInfinity) // unbounded in freq
  }

  test("LMDirichlet formula: ln(1 + tf/(mu*p)) + ln(mu/(dl+mu)), clamped at 0") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val sim = LMDirichletSim() // mu = 2000
    val p = 21.0 / 50001.0
    val s = sim.doubleScorer(1.0, df = 9, ttf = 20, stats)
    val expected = math.log(1 + 4.0 / (2000.0 * p)) + math.log(2000.0 / 2016.0)
    assert(math.abs(s.score(4.0, nb) - expected) < 1e-12)
    // low tf in a long doc goes negative -> clamp to 0 (LMDirichletSimilarity.java:86-88)
    val nbLong = Bm25.encodeNorm(5000) & 0xFF
    val rare = sim.doubleScorer(1.0, df = 1, ttf = 40000, stats) // common word
    assert(rare.score(1.0, nbLong) == 0.0)
    assert(sim.scorer(1f, 1, 40000, stats).score(1f, nbLong) == 0f)
  }

  test("LMJelinekMercer formula: ln(1 + ((1-lambda)*tf/dl) / (lambda*p))") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val sim = LMJelinekMercerSim(0.1)
    val p = 21.0 / 50001.0
    val expected = math.log(1 + (0.9 * 4.0 / 16.0) / (0.1 * p))
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(4.0, nb) - expected) < 1e-12)
    assert(sim.doubleScorer(1.0, 9, 20, stats).score(1.0, nb) > 0.0) // never clamps
    intercept[IllegalArgumentException](LMJelinekMercerSim(0.0))
    intercept[IllegalArgumentException](LMJelinekMercerSim(1.5))
  }

  test("DFISim: zero at/below expected freq, log2 standardized divergence above") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val sim = DFISim()
    val s = sim.doubleScorer(1.0, df = 9, ttf = 20, stats)
    val expected = 21.0 * 16.0 / 50001.0 // (ttf+1)*dl/(sttf+1) ~ 0.00672
    assert(s.score(0.001, nb) >= 0.0 && sim.doubleScorer(1.0, 9, 20000000, stats).score(1.0, nb) == 0.0)
    val want = math.log((4.0 - expected) / math.sqrt(expected) + 1) / math.log(2.0)
    assert(math.abs(s.score(4.0, nb) - want) < 1e-12)
  }

  test("BooleanSim: score == boost, freq/norm ignored; maxScore bounded") {
    val s = BooleanSim.scorer(2.5f, 9, 20, stats)
    assert(s.score(1f, 0) == 2.5f && s.score(100f, 200) == 2.5f)
    assert(s.maxScore == 2.5f)
    assert(BooleanSim.doubleScorer(2.5, 9, 20, stats).score(7.0, 3) == 2.5)
  }

  test("Bm25Sim delegates exactly to the Float-faithful Bm25 scorer") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val a = Bm25Sim(Bm25.DEFAULT_K1, Bm25.DEFAULT_B).scorer(1.5f, 9, 20, stats)
    val b = Bm25.scorer(1.5f, Bm25.DEFAULT_K1, Bm25.DEFAULT_B, 9, stats)
    assert(a.score(4f, nb) == b.score(4f, nb))
    assert(a.maxScore == b.maxScore)
  }

  test("DFR InL2 formula: log2((N+1)/(df+0.5)) * (1 - 1/(1+tfn)), tfn = tf*log2(1+avgdl/dl)") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val sim = DFRInL2Sim()
    val avgdl = 50000.0 / 1000.0
    val tfn = 4.0 * (math.log(1 + avgdl / 16.0) / math.log(2.0))
    val a = math.log(1001.0 / 9.5) / math.log(2.0)
    val expected = a * (1 - 1 / (1 + tfn))
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(4.0, nb) - expected) < 1e-12)
    // bounded: maxScore = boost * A (BasicModelIn score -> A as tfn -> inf)
    val f = sim.scorer(2f, 9, 20, stats)
    assert(math.abs(f.maxScore - 2 * a) < 1e-6)
    assert(f.score(1000000f, nb) <= f.maxScore)
  }

  test("IB LL-D-H2 formula: -ln(lambda/(tfn+lambda)), lambda = (df+1)/(N+1)") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val sim = IBLLSim()
    val avgdl = 50000.0 / 1000.0
    val tfn = 4.0 * (math.log(1 + avgdl / 16.0) / math.log(2.0))
    val lambda = 10.0 / 1001.0
    val expected = -math.log(lambda / (tfn + lambda))
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(4.0, nb) - expected) < 1e-12)
    assert(sim.scorer(1f, 9, 20, stats).maxScore == Float.PositiveInfinity)
  }

  test("AxiomaticF2EXP formula: tf/(tf + s + s*dl/avgdl) * ((N+1)/df)^k, s=0.25 k=0.35") {
    val nb = Bm25.encodeNorm(16) & 0xFF
    val sim = AxiomaticF2EXPSim()
    val avgdl = 50000.0 / 1000.0
    val idf = math.pow(1001.0 / 9.0, 0.35)
    val expected = (4.0 / (4.0 + 0.25 + 0.25 * 16.0 / avgdl)) * idf
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(4.0, nb) - expected) < 1e-12)
    // tfln < 1 always -> maxScore = boost * idf, finite
    val f = sim.scorer(1f, 9, 20, stats)
    assert(math.abs(f.maxScore - idf) < 1e-6)
    assert(f.score(1000000f, nb) < f.maxScore)
  }

  private val queries = Seq(
    "return",
    "indexwriter",
    "index AND indexwriter",
    "parsequery OR mergepolicy",
    "\"foo.bar x2y\"",
    "indexwriter^2.5 OR parsequery",
    "merge*")

  test("SweetSpotSim: plateau lengthNorm 1.0 inside [min,max], baselineTf floor") {
    val sim = SweetSpotSim(lnMin = 3, lnMax = 20, steepness = 0.5, tfBase = 1.5, tfMin = 2.0)
    val idf = math.log(1001.0 / 10.0) + 1
    // dl = 16 sits inside the sweet spot -> lengthNorm exactly 1.0
    val nbIn = Bm25.encodeNorm(16) & 0xFF
    // freq <= tfMin floors at tfBase
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(2.0, nbIn) - idf * 1.5) < 1e-12)
    // freq above the floor: sqrt(freq + base^2 - min)
    val expTf = math.sqrt(9.0 + 2.25 - 2.0)
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(9.0, nbIn) - idf * expTf) < 1e-12)
    // dl = 22 is 2 past the plateau -> 1/sqrt(0.5*(19+2-17)+1) = 1/sqrt(3)
    val nbOut = Bm25.encodeNorm(22) & 0xFF
    val expNorm = 1.0 / math.sqrt(0.5 * (math.abs(22.0 - 3) + math.abs(22.0 - 20) - 17) + 1.0)
    assert(math.abs(sim.doubleScorer(1.0, 9, 20, stats).score(2.0, nbOut) - idf * 1.5 * expNorm) < 1e-12)
  }

  test("distributed top-k under each similarity is identical to brute force") {
    for (sim <- Seq[Similarity](ClassicSim, LMDirichletSim(), LMJelinekMercerSim(),
                                DFISim(), BooleanSim, DFRInL2Sim(), IBLLSim(),
                                AxiomaticF2EXPSim(), SweetSpotSim());
         q <- queries) {
      val s = base.withSimilarity(sim)
      val ast = s.parse(q)
      assert(s.search(ast, 10, null).toSeq == s.bruteForce(ast, 10).toSeq,
        s"sim=$sim query=$q")
    }
  }

  test("different similarities actually rank differently on a tf/length-contrast corpus") {
    // docA: term once in a short doc; docB: term 5x in a long doc.
    // Classic (sqrt tf / sqrt len) and BM25 disagree with Boolean (tie).
    val micro = Seq(
      CodeFile("r", "a", "c1", "txt", "needle alpha"),
      CodeFile("r", "b", "c1", "txt",
        ("needle " * 5) + ("filler " * 60)))
    val idx = IndexBuilder.build(spark.createDataset(micro), IndexConfig(numPartitions = 1))
    val paths = idx.docs.collect().map(d => d.docId -> d.path).toMap
    def top(sim: Similarity): Seq[String] =
      new GraftSearcher(idx, sim = sim).search("needle", 2).map(h => paths(h.docId)).toSeq
    assert(top(BooleanSim).toSet == Set("a", "b")) // tie, both returned
    // LM models: tf=5 at len 65 beats tf=1 at len 2? Dirichlet: dominated by
    // the length prior at tiny mu-relative lengths -> short doc wins.
    assert(top(LMDirichletSim()).head == "a")
    // Classic: sqrt(1)/sqrt(2) = 0.707 vs sqrt(5)/sqrt(65) = 0.277 -> a wins
    assert(top(ClassicSim).head == "a")
  }
}
