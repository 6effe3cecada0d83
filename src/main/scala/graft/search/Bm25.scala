package graft.search

import graft.codec.SmallFloat

/** Collection-level statistics: docCount and the sum of all field lengths
  * (= sum of total term frequencies), mirroring Lucene `CollectionStatistics`. */
final case class CollectionStats(docCount: Long, sumTotalTermFreq: Long) extends Serializable {
  /** avgdl in Lucene: double division, cast to float
    * (reference: lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:79-82). */
  def avgdl: Float = (sumTotalTermFreq / docCount.toDouble).toFloat
  /** Full-precision avgdl for the double-scored (oracle-facing) path. */
  def avgdlD: Double = sumTotalTermFreq / docCount.toDouble
}

/** BM25 scoring, Float-faithful to Lucene's `BM25Similarity`
  * (reference: lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java).
  *
  * The score expression is the algebraic rewrite Lucene uses for float
  * monotonicity: `weight - weight / (1 + freq * cache[norm])` with
  * `weight = boost * idf` — any re-association or Double creep breaks
  * rank-identity, so all arithmetic below is explicitly Float.
  */
object Bm25 {
  val DEFAULT_K1 = 1.2f
  val DEFAULT_B = 0.75f

  /** LENGTH_TABLE[i] = decoded length for norm byte i
    * (reference: BM25Similarity.java:106-112). */
  val LENGTH_TABLE: Array[Float] =
    Array.tabulate(256)(i => SmallFloat.byte4ToInt(i.toByte).toFloat)

  /** idf = log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5)), computed in
    * double, used as float (reference: BM25Similarity.java:69-72). */
  def idf(docFreq: Long, docCount: Long): Float =
    math.log(1 + (docCount - docFreq + 0.5d) / (docFreq + 0.5d)).toFloat

  /** Per-(term,field) 256-entry norm cache
    * (reference: BM25Similarity.java:212-220). */
  def normCache(k1: Float, b: Float, avgdl: Float): Array[Float] =
    Array.tabulate(256)(i => 1f / (k1 * ((1 - b) + b * LENGTH_TABLE(i) / avgdl)))

  def encodeNorm(fieldLength: Int): Byte = SmallFloat.intToByte4(fieldLength)

  /** The per-term scorer (Lucene `BM25Scorer`). */
  final class Scorer(val weight: Float, cache: Array[Float]) extends SimScorer {
    /** reference: BM25Similarity.java:222-235 */
    def score(freq: Float, normByte: Int): Float = {
      val normInverse = cache(normByte & 0xFF)
      weight - weight / (1f + freq * normInverse)
    }
    /** Upper bound of any score from this scorer (freq -> inf). */
    def maxScore: Float = weight
  }

  def scorer(boost: Float, k1: Float, b: Float, docFreq: Long, stats: CollectionStats): Scorer = {
    val w = boost * idf(docFreq, stats.docCount)
    new Scorer(w, normCache(k1, b, stats.avgdl))
  }

  /** Scorer for multi-term constructs (phrase / synonym): idf is the SUM of
    * per-term idfs computed in double
    * (reference: BM25Similarity.java idfExplain :172-181). */
  def multiTermScorer(boost: Float, k1: Float, b: Float, docFreqs: Seq[Long], stats: CollectionStats): Scorer = {
    var idfSum = 0.0d
    docFreqs.foreach { df =>
      idfSum += math.log(1 + (stats.docCount - df + 0.5d) / (df + 0.5d))
    }
    new Scorer(boost * idfSum.toFloat, normCache(k1, b, stats.avgdl))
  }

  /** Double-precision textbook BM25 used ONLY by the SQL-oracle-facing
    * queries (so DuckDB can reproduce it exactly):
    * idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)), exact doc lengths
    * (no lossy norm byte). Keep the op order in sync with the SQL strings
    * in `graft.ops.TextSearchOps`. */
  def scoreDouble(tf: Double, dl: Double, avgdl: Double, docFreq: Long, docCount: Long,
                  k1: Double = 1.2d, b: Double = 0.75d): Double = {
    val idfD = math.log(1 + (docCount - docFreq + 0.5d) / (docFreq + 0.5d))
    idfD * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
  }

  /** Double-precision idf, the exact value Lucene computes before the float
    * cast (reference: BM25Similarity.java:69-72). */
  def idfDouble(docFreq: Long, docCount: Long): Double =
    math.log(1 + (docCount - docFreq + 0.5d) / (docFreq + 0.5d))

  /** Per-term scorer for the DOUBLE-precision scored-search family
    * (`ft_search_*`): same postings/norm inputs as the Float path (dl is the
    * SmallFloat-quantized length decoded from the norm byte — the oracle SQL
    * reproduces the quantization bit-exactly), but textbook double BM25 so a
    * DuckDB oracle can recompute every score. Op order here MUST stay in
    * sync with the oracle SQL in `graft.queries.FulltextQueries`. */
  final class DoubleScorer(val weightD: Double, k1: Double, b: Double, avgdlD: Double)
      extends DoubleSimScorer {
    def score(freq: Double, normByte: Int): Double = {
      val dl = LENGTH_TABLE(normByte & 0xFF).toDouble
      weightD * (freq * (k1 + 1)) / (freq + k1 * (1 - b + b * dl / avgdlD))
    }
  }

  def doubleScorer(boost: Double, k1: Double, b: Double, docFreq: Long,
                   stats: CollectionStats): DoubleScorer =
    new DoubleScorer(boost * idfDouble(docFreq, stats.docCount), k1, b, stats.avgdlD)

  /** Multi-term double scorer (phrase): idf = sum of per-term idfs. */
  def multiTermDoubleScorer(boost: Double, k1: Double, b: Double, docFreqs: Seq[Long],
                            stats: CollectionStats): DoubleScorer = {
    var idfSum = 0.0d
    docFreqs.foreach(df => idfSum += idfDouble(df, stats.docCount))
    new DoubleScorer(boost * idfSum, k1, b, stats.avgdlD)
  }
}
