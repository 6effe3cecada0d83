package graft.search

/** Per-term scorer interface — the analog of Lucene's
  * `Similarity.SimScorer` (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/Similarity.java:228-268):
  * score from (term frequency, norm byte), plus the upper bound used by
  * block-max pruning. Implementations MUST be monotone increasing in `freq`
  * and non-increasing in decoded doc length — the competitive-impacts
  * frontier stored per posting block assumes exactly that ordering, so any
  * conforming similarity can reuse impact-based skipping unchanged. */
trait SimScorer extends Serializable {
  def score(freq: Float, normByte: Int): Float
  /** Upper bound over all (freq, norm); `Float.PositiveInfinity` disables
    * global WAND pruning (per-block impact bounds still apply). */
  def maxScore: Float
}

/** Double-precision twin for the oracle-facing scored family (DuckDB
  * recomputes every score; op order must match the oracle SQL verbatim). */
trait DoubleSimScorer extends Serializable {
  def score(freq: Double, normByte: Int): Double
}

/** Pluggable scoring model — the analog of Lucene's `Similarity`
  * (reference: lucene/core/src/java/org/apache/lucene/search/similarities/
  * Similarity.java; IndexSearcher.setSimilarity). Factories receive the
  * term's docFreq AND totalTermFreq (LM models need the collection
  * frequency, reference: LMSimilarity.java:50-57 computeProbability).
  * Multi-term (phrase/synonym) stats follow each model's own combination
  * rule. The norm byte encoding is shared across similarities (SmallFloat
  * quantized length), exactly as in Lucene 7+ where norms are
  * similarity-independent length encodings. */
trait Similarity extends Serializable {
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer
  /** Multi-term construct (phrase / synonym): per-term (df, ttf) pairs. */
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer
}

/** Lucene's default: BM25 (reference: BM25Similarity.java). Delegates to
  * the Float-faithful [[Bm25]] implementations; `ttf` is unused (BM25 is a
  * docFreq model). */
final case class Bm25Sim(k1: Float, b: Float) extends Similarity {
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    Bm25.scorer(boost, k1, b, df, stats)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    Bm25.doubleScorer(boost, k1, b, df, stats)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    Bm25.multiTermScorer(boost, k1, b, freqs.map(_._1), stats)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    Bm25.multiTermDoubleScorer(boost, k1, b, freqs.map(_._1), stats)
}

/** ClassicSimilarity — the pre-BM25 practical TF-IDF (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/ClassicSimilarity.java:
  * tf = sqrt(freq) :58-61, idf = log((docCount+1)/(docFreq+1)) + 1 :70-73,
  * lengthNorm = 1/sqrt(length) :45-48; TFIDFSimilarity.TFIDFScorer.score
  * :539-545 = queryWeight * tf * normValue, queryWeight = boost * idf).
  * Scores are unbounded in freq, so `maxScore` is +inf: global WAND floors
  * never fire, but per-block impact bounds (computed through this scorer on
  * the stored (freq, norm) frontier) still prune — mirroring how Lucene's
  * TFIDF impacts work. */
object ClassicSim extends Similarity {
  private def idf(df: Long, n: Long): Double =
    math.log((n + 1).toDouble / (df + 1).toDouble) + 1.0d

  private final class FloatScorer(w: Float) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF)
      (w * math.sqrt(freq.toDouble).toFloat) * (1d / math.sqrt(dl.toDouble)).toFloat
    }
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(w: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      w * math.sqrt(freq) / math.sqrt(dl)
    }
  }

  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer((boost * idf(df, stats.docCount)).toFloat)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost * idf(df, stats.docCount))
  /** Phrase idf = sum of member idfs (TFIDFSimilarity.idfExplain for
    * multiple TermStatistics, reference: TFIDFSimilarity.java:435-446). */
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer((boost * freqs.map(f => idf(f._1, stats.docCount)).sum).toFloat)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost * freqs.map(f => idf(f._1, stats.docCount)).sum)
}

/** SweetSpotSimilarity — ClassicSimilarity with a doc-length "sweet spot"
  * plateau and a baseline tf floor (reference:
  * lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java:
  * lengthNorm(numTerms) = 1/sqrt(steepness·(|x−min|+|x−max|−(max−min)) + 1)
  * :117-133 — flat 1.0 inside [min, max], hyperbolic falloff outside;
  * baselineTf(freq) = 0 at 0, base for freq ≤ min, sqrt(freq + base² − min)
  * above :150-165; idf inherited from the TF-IDF family). Same
  * (freq, norm-byte) inputs as [[ClassicSim]]; the norm byte decodes to the
  * quantized doc length that feeds lengthNorm, exactly as Lucene's
  * query-time 256-entry norm cache does. */
final case class SweetSpotSim(
    lnMin: Int = 3, lnMax: Int = 20, steepness: Double = 0.5d,
    tfBase: Double = 1.5d, tfMin: Double = 2.0d) extends Similarity {
  private def idf(df: Long, n: Long): Double =
    math.log((n + 1).toDouble / (df + 1).toDouble) + 1.0d
  private def lengthNorm(dl: Double): Double =
    1.0d / math.sqrt(
      steepness * (math.abs(dl - lnMin) + math.abs(dl - lnMax) - (lnMax - lnMin)) + 1.0d)
  private def baselineTf(freq: Double): Double =
    if (freq == 0d) 0d
    else if (freq <= tfMin) tfBase
    else math.sqrt(freq + tfBase * tfBase - tfMin)

  private final class FloatScorer(w: Float) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      (w * baselineTf(freq.toDouble).toFloat) * lengthNorm(dl).toFloat
    }
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(w: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      w * baselineTf(freq) * lengthNorm(dl)
    }
  }

  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer((boost * idf(df, stats.docCount)).toFloat)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost * idf(df, stats.docCount))
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer((boost * freqs.map(f => idf(f._1, stats.docCount)).sum).toFloat)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost * freqs.map(f => idf(f._1, stats.docCount)).sum)
}

/** LMDirichletSimilarity — Bayesian smoothing language model (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/LMDirichletSimilarity.java:74-88:
  * score = boost * (log(1 + freq/(mu*p)) + log(mu/(docLen+mu))), clamped at
  * 0; p = collection probability = (totalTermFreq+1)/(sumTotalTermFreq+1),
  * LMSimilarity.java:55 computeProbability; default mu = 2000 :62).
  * Multi-term combination sums member collection frequencies (df capped at
  * docCount), documented deviation: Lucene's PhraseWeight feeds blended
  * pseudo-stats instead. */
/** LMJelinekMercerSimilarity — linear-interpolation smoothing (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/LMJelinekMercerSimilarity.java:63-68:
  * score = boost * log(1 + ((1-λ)·freq/docLen) / (λ·p)); λ ∈ (0, 1],
  * p = (totalTermFreq+1)/(sumTotalTermFreq+1) as in LMSimilarity.java:55.
  * Always > 0 (no clamp — log1p of a positive). Multi-term combination sums
  * member collection frequencies, same documented deviation as
  * [[LMDirichletSim]]. */
final case class LMJelinekMercerSim(lambda: Double = 0.1d) extends Similarity {
  require(lambda > 0 && lambda <= 1, "lambda must be in (0, 1]")
  private final class FloatScorer(boost: Float, p: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      (boost * math.log(1 + ((1 - lambda) * freq / dl) / (lambda * p))).toFloat
    }
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(boost: Double, p: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      boost * math.log(1 + ((1 - lambda) * freq / dl) / (lambda * p))
    }
  }
  private def prob(ttf: Long, stats: CollectionStats): Double =
    (ttf + 1).toDouble / (stats.sumTotalTermFreq + 1).toDouble

  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, prob(ttf, stats))
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, prob(ttf, stats))
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, prob(freqs.map(_._2).sum, stats))
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, prob(freqs.map(_._2).sum, stats))
}

/** DFISimilarity — divergence from independence (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/DFISimilarity.java:55-65:
  * expected = (ttf+1)·docLen/(sumTotalTermFreq+1); freq <= expected → 0;
  * else boost · log2(independence(freq, expected) + 1)). The standardized
  * measure (freq − expected)/sqrt(expected) is Lucene's
  * `IndependenceStandardized.java:28-30`. */
final case class DFISim(measure: String = "std") extends Similarity {
  private def raw(freq: Double, normByte: Int, ttf: Long, stats: CollectionStats): Double = {
    val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
    val expected = (ttf + 1).toDouble * dl / (stats.sumTotalTermFreq + 1).toDouble
    if (freq <= expected) 0d
    else {
      // the three Independence measures (reference: IndependenceStandardized
      // .java:28-31, IndependenceSaturated.java:28-31,
      // IndependenceChiSquared.java:28-31)
      val m = measure match {
        case "sat" => (freq - expected) / expected
        case "chi" => (freq - expected) * (freq - expected) / expected
        case _ => (freq - expected) / math.sqrt(expected)
      }
      math.log(m + 1) / math.log(2d)
    }
  }
  private final class FloatScorer(boost: Float, ttf: Long, stats: CollectionStats) extends SimScorer {
    def score(freq: Float, normByte: Int): Float =
      (boost * raw(freq.toDouble, normByte, ttf, stats)).toFloat
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(boost: Double, ttf: Long, stats: CollectionStats) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost * raw(freq, normByte, ttf, stats)
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, ttf, stats)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, ttf, stats)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, freqs.map(_._2).sum, stats)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, freqs.map(_._2).sum, stats)
}

/** MultiSimilarity — CombSUM evidence combination: the score is the SUM of
  * the sub-similarities' scores for the same (freq, norm) (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/
  * MultiSimilarity.java:34-58, Shaw & Fox TREC-2 CombSUM). `maxScore` sums
  * the sub-bounds (+inf if any sub-similarity is unbounded). */
final case class MultiSim(sims: Seq[Similarity]) extends Similarity {
  private final class SumScorer(ss: Seq[SimScorer]) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = {
      var s = 0f
      ss.foreach(x => s += x.score(freq, normByte))
      s
    }
    def maxScore: Float = {
      var s = 0f
      ss.foreach(x => s += x.maxScore)
      s
    }
  }
  private final class SumDblScorer(ss: Seq[DoubleSimScorer]) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      var s = 0d
      ss.foreach(x => s += x.score(freq, normByte))
      s
    }
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new SumScorer(sims.map(_.scorer(boost, df, ttf, stats)))
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new SumDblScorer(sims.map(_.doubleScorer(boost, df, ttf, stats)))
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new SumScorer(sims.map(_.multiTermScorer(boost, freqs, stats)))
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new SumDblScorer(sims.map(_.multiTermDoubleScorer(boost, freqs, stats)))
}

/** BooleanSimilarity — score == query boost, freq/norm ignored (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/BooleanSimilarity.java:59-61).
  * Under a SHOULD disjunction the engine sums clause scores, so a doc's
  * score is the sum of the boosts of the clauses it matches — exactly
  * Lucene's behavior with this similarity. maxScore = boost keeps WAND
  * floors live. */
object BooleanSim extends Similarity {
  private final class FloatScorer(boost: Float) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = boost
    def maxScore: Float = boost
  }
  private final class DblScorer(boost: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost)
}

final case class LMDirichletSim(mu: Double = 2000d) extends Similarity {
  private final class FloatScorer(boost: Float, p: Double, mu: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      val s = math.log(1 + freq / (mu * p)) + math.log(mu / (dl + mu))
      if (s > 0) (boost * s).toFloat else 0f
    }
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(boost: Double, p: Double, mu: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      val s = math.log(1 + freq / (mu * p)) + math.log(mu / (dl + mu))
      if (s > 0) boost * s else 0d
    }
  }
  private def prob(ttf: Long, stats: CollectionStats): Double =
    (ttf + 1).toDouble / (stats.sumTotalTermFreq + 1).toDouble

  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, prob(ttf, stats), mu)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, prob(ttf, stats), mu)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, prob(freqs.map(_._2).sum, stats), mu)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, prob(freqs.map(_._2).sum, stats), mu)
}

/** DFRSimilarity with BasicModel I(n), AfterEffect L, Normalization H2 —
  * the classic "InL2" divergence-from-randomness configuration (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/DFRSimilarity.java:110-114
  * score = boost · basicModel(tfn, ae·(1+tfn));
  * BasicModelIn.java:36-43 A = log2((N+1)/(n+0.5)), score = A · ae1pTfn ·
  * (1 − 1/(1+tfn)); AfterEffectL.java:32-34 ae·(1+tfn) = 1;
  * NormalizationH2.java:58-59 tfn = tf · log2(1 + c·avgfl/fl), default c=1).
  * The I(n) basic model is bounded above by A as tfn → ∞, so `maxScore`
  * is finite and global WAND floors stay live — unlike the LM family. */
final case class DFRInL2Sim(c: Double = 1d) extends Similarity {
  private val LOG2 = math.log(2d)
  private def raw(freq: Double, normByte: Int, a: Double, avgdl: Double): Double = {
    val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
    val tfn = freq * (math.log(1 + c * avgdl / dl) / LOG2)
    a * 1.0d * (1 - 1 / (1 + tfn))
  }
  private def bigA(df: Long, n: Long): Double =
    math.log((n + 1).toDouble / (df + 0.5d)) / LOG2

  private final class FloatScorer(boost: Float, a: Double, avgdl: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float =
      (boost * raw(freq.toDouble, normByte, a, avgdl)).toFloat
    def maxScore: Float = (boost * a).toFloat // I(n) ≤ A, ae·(1+tfn) = 1
  }
  private final class DblScorer(boost: Double, a: Double, avgdl: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost * raw(freq, normByte, a, avgdl)
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, bigA(df, stats.docCount), stats.avgdlD)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, bigA(df, stats.docCount), stats.avgdlD)
  /** Multi-term (phrase / synonym): pseudo-df = min(Σ df, docCount) — the
    * same blended-stat deviation documented on [[LMDirichletSim]]. */
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, bigA(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, bigA(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
}

/** DFRSimilarity(BasicModelG, AfterEffectB, NormalizationH1) — the
  * geometric Bose-Einstein DFR combo (reference: BasicModelG.java:36-51
  * score = (B − (B−A)/(1+tfn))·aeTimes1pTfn with λ = F/(N+F), F = ttf+1,
  * A = log2(λ+1), B = log2((1+λ)/λ); AfterEffectB.java:31-36
  * aeTimes1pTfn = (F+1)/(df+1); NormalizationH1.java:56-58
  * tfn = tf·c·(avgfl/fl), default c=1). B bounds the basic model above, so
  * maxScore = boost·B·aet is finite — WAND-compatible. */
final case class DFRGB1Sim(c: Double = 1d) extends Similarity {
  private val LOG2 = math.log(2d)
  private final class Core(df: Long, ttf: Long, stats: CollectionStats) extends Serializable {
    val F: Double = (ttf + 1).toDouble
    val lambda: Double = F / (stats.docCount + F)
    val a: Double = math.log(lambda + 1) / LOG2
    val b: Double = math.log((1 + lambda) / lambda) / LOG2
    val aet: Double = (F + 1.0d) / (df + 1.0d)
    def raw(freq: Double, normByte: Int): Double = {
      val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
      val tfn = freq * c * (stats.avgdlD / dl)
      (b - (b - a) / (1 + tfn)) * aet
    }
  }
  private final class FloatScorer(boost: Float, core: Core) extends SimScorer {
    def score(freq: Float, normByte: Int): Float =
      (boost * core.raw(freq.toDouble, normByte)).toFloat
    def maxScore: Float = (boost * core.b * core.aet).toFloat
  }
  private final class DblScorer(boost: Double, core: Core) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost * core.raw(freq, normByte)
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, new Core(df, ttf, stats))
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, new Core(df, ttf, stats))
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, new Core(
      math.min(freqs.map(_._1).sum, stats.docCount), freqs.map(_._2).sum, stats))
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, new Core(
      math.min(freqs.map(_._1).sum, stats.docCount), freqs.map(_._2).sum, stats))
}

/** IBSimilarity(DistributionSPL, LambdaTTF, NormalizationH2) — the
  * smoothed power-law information model (reference: DistributionSPL.java:
  * 36-59 score = −ln((λ^q − λ)/(1 − λ)), q = 1 − 1/(tfn+1);
  * LambdaTTF.java:31-38 λ = (F+1)/(N+1); NormalizationH2 tfn as in
  * [[IBLLSim]]). The nextUp/nextDown degenerate-λ guards are omitted: with
  * real collection stats λ ≠ 1 and λ^q ≠ λ. Unbounded → maxScore = +inf. */
final case class IBSPLSim(c: Double = 1d) extends Similarity {
  private val LOG2 = math.log(2d)
  private def raw(freq: Double, normByte: Int, lambda: Double, avgdl: Double): Double = {
    val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
    val tfn = freq * (math.log(1 + c * avgdl / dl) / LOG2)
    val q = 1 - 1 / (tfn + 1)
    -math.log((math.pow(lambda, q) - lambda) / (1 - lambda))
  }
  private def lambdaD(ttf: Long, n: Long): Double = (ttf + 1.0d) / (n + 1.0d)
  private final class FloatScorer(boost: Float, lambda: Double, avgdl: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float =
      (boost * raw(freq.toDouble, normByte, lambda, avgdl)).toFloat
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(boost: Double, lambda: Double, avgdl: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost * raw(freq, normByte, lambda, avgdl)
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, lambdaD(ttf, stats.docCount), stats.avgdlD)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, lambdaD(ttf, stats.docCount), stats.avgdlD)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, lambdaD(freqs.map(_._2).sum, stats.docCount), stats.avgdlD)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, lambdaD(freqs.map(_._2).sum, stats.docCount), stats.avgdlD)
}

/** IBSimilarity(DistributionLL, LambdaDF, NormalizationH2) — the
  * information-based model with log-logistic distribution (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/IBSimilarity.java
  * score = boost · distribution(tfn, λ); DistributionLL.java:33-34
  * score = −ln(λ/(tfn+λ)); LambdaDF.java:36-38 λ = (df+1)/(N+1);
  * NormalizationH2.java:58-59 tfn = tf · log2(1 + c·avgfl/fl), c=1).
  * The double twin keeps λ in double precision so the DuckDB oracle can
  * recompute it verbatim; the Float path mirrors Lucene's float-cast λ
  * (LambdaDF.java:36). Unbounded in tfn → maxScore = +inf (impact-block
  * pruning still applies through the frontier, like the LM family). */
final case class IBLLSim(c: Double = 1d) extends Similarity {
  private val LOG2 = math.log(2d)
  private def tfn(freq: Double, normByte: Int, avgdl: Double): Double = {
    val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
    freq * (math.log(1 + c * avgdl / dl) / LOG2)
  }
  private final class FloatScorer(boost: Float, lambda: Float, avgdl: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float = {
      val t = tfn(freq.toDouble, normByte, avgdl)
      (boost * -math.log(lambda / (t + lambda))).toFloat
    }
    def maxScore: Float = Float.PositiveInfinity
  }
  private final class DblScorer(boost: Double, lambda: Double, avgdl: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      val t = tfn(freq, normByte, avgdl)
      boost * -math.log(lambda / (t + lambda))
    }
  }
  private def lambdaD(df: Long, n: Long): Double = (df + 1.0d) / (n + 1.0d)

  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, lambdaD(df, stats.docCount).toFloat, stats.avgdlD)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, lambdaD(df, stats.docCount), stats.avgdlD)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost,
      lambdaD(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount).toFloat, stats.avgdlD)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost,
      lambdaD(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
}

/** AxiomaticF2EXP — axiomatic retrieval, function F2-EXP (reference:
  * lucene/core/src/java/org/apache/lucene/search/similarities/Axiomatic.java:104-110
  * score = boost · max(0, tf·ln·tfln·idf − gamma); AxiomaticF2EXP.java:61-94
  * tf = ln = 1, gamma = 0, tfln = freq/(freq + s + s·dl/avgdl),
  * idf = ((N+1)/df)^k; defaults s=0.25, k=0.35 (Axiomatic.java:99-101)).
  * tfln < 1 always, so maxScore = boost·idf is finite — WAND-compatible. */
final case class AxiomaticF2EXPSim(s: Double = 0.25d, k: Double = 0.35d) extends Similarity {
  private def idf(df: Long, n: Long): Double = math.pow((n + 1.0d) / df.toDouble, k)
  private def raw(freq: Double, normByte: Int, w: Double, avgdl: Double): Double = {
    val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
    val tfln = freq / (freq + s + s * dl / avgdl)
    val sc = 1.0d * 1.0d * tfln * w - 0.0d
    if (sc > 0) sc else 0d
  }
  private final class FloatScorer(boost: Float, w: Double, avgdl: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float =
      (boost * raw(freq.toDouble, normByte, w, avgdl)).toFloat
    def maxScore: Float = (boost * w).toFloat // tfln < 1
  }
  private final class DblScorer(boost: Double, w: Double, avgdl: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost * raw(freq, normByte, w, avgdl)
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, idf(df, stats.docCount), stats.avgdlD)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, idf(df, stats.docCount), stats.avgdlD)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, idf(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, idf(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
}

/** AxiomaticF2LOG — the log-idf sibling of F2-EXP (reference:
  * AxiomaticF2LOG.java:61-79: tf = ln = 1, gamma = 0, tfln identical to
  * F2EXP, idf = ln((N+1)/df) — natural log, no exponent parameter).
  * Same finite bound: maxScore = boost·idf. */
final case class AxiomaticF2LOGSim(s: Double = 0.25d) extends Similarity {
  private def idf(df: Long, n: Long): Double = math.log((n + 1.0d) / df.toDouble)
  private def raw(freq: Double, normByte: Int, w: Double, avgdl: Double): Double = {
    val dl = Bm25.LENGTH_TABLE(normByte & 0xFF).toDouble
    val tfln = freq / (freq + s + s * dl / avgdl)
    val sc = 1.0d * 1.0d * tfln * w - 0.0d
    if (sc > 0) sc else 0d
  }
  private final class FloatScorer(boost: Float, w: Double, avgdl: Double) extends SimScorer {
    def score(freq: Float, normByte: Int): Float =
      (boost * raw(freq.toDouble, normByte, w, avgdl)).toFloat
    def maxScore: Float = (boost * w).toFloat
  }
  private final class DblScorer(boost: Double, w: Double, avgdl: Double) extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = boost * raw(freq, normByte, w, avgdl)
  }
  def scorer(boost: Float, df: Long, ttf: Long, stats: CollectionStats): SimScorer =
    new FloatScorer(boost, idf(df, stats.docCount), stats.avgdlD)
  def doubleScorer(boost: Double, df: Long, ttf: Long, stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, idf(df, stats.docCount), stats.avgdlD)
  def multiTermScorer(boost: Float, freqs: Seq[(Long, Long)], stats: CollectionStats): SimScorer =
    new FloatScorer(boost, idf(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
  def multiTermDoubleScorer(boost: Double, freqs: Seq[(Long, Long)], stats: CollectionStats): DoubleSimScorer =
    new DblScorer(boost, idf(math.min(freqs.map(_._1).sum, stats.docCount), stats.docCount), stats.avgdlD)
}
