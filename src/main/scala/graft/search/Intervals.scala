package graft.search

/** Minimal-interval algebra — the Lucene intervals module re-expressed over
  * this engine's decoded position lists (reference:
  * lucene/queries/src/java/org/apache/lucene/queries/intervals/Intervals.java,
  * OrderedIntervalsSource.java, UnorderedIntervalsSource.java; the `maxgaps`
  * filter is FilteredIntervalsSource.maxGaps, FilteredIntervalsSource.java).
  *
  * Intervals differ from span queries in that only MINIMAL intervals are
  * enumerated (an interval containing another matching interval is never
  * emitted — the Vigna minimal-interval semantics Lucene adopted), so the
  * per-doc interval count is well-defined and `maxgaps` filters each minimal
  * interval by its internal gap, not by any covering window.
  *
  * Both counters take ascending position arrays (as decoded from the posting
  * blocks by [[graft.codec.PostingsCodec.decodePositions]]) and run a single
  * linear merge — O(|pa| + |pb|) per document, no allocation.
  */
object Intervals {

  /** Count of minimal ordered intervals (i, j): `tk(i) = a`, `tk(j) = b`,
    * i < j, with no other `a` in (i, j) and no other `b` in (i, j), whose
    * internal gap `j - i - 1 <= maxgaps`. Minimality for the ordered pair is
    * exactly "j is the first b after i AND the next a is not before j"
    * (OrderedIntervalsSource.java's nextInterval advances the inner source
    * past nested starts). */
  def orderedMaxgapsCount(pa: Array[Int], pb: Array[Int], maxgaps: Int): Int = {
    var k = 0
    var m = 0
    var count = 0
    while (m < pa.length && k < pb.length) {
      val i = pa(m)
      while (k < pb.length && pb(k) <= i) k += 1
      if (k < pb.length) {
        val j = pb(k) // first b after i; no b inside (i, j) by construction
        val nextA = if (m + 1 < pa.length) pa(m + 1) else Int.MaxValue
        if (nextA >= j && j - i - 1 <= maxgaps) count += 1
      }
      m += 1
    }
    count
  }

  /** IntervalQuery-style sloppy frequency: the sum of `1 / (1 + gap)` over
    * every minimal ordered interval (no maxgaps filter) — tighter intervals
    * contribute more, the saturating-frequency shape `IntervalQuery` feeds
    * its similarity (reference: lucene/queries/src/java/org/apache/lucene/
    * queries/intervals/IntervalScoreFunction.java — SaturationFunction over
    * the slop-weighted interval freq). Summation runs in ascending-i order
    * so the engine and the oracle add the same doubles in the same order. */
  def orderedSloppyFreq(pa: Array[Int], pb: Array[Int]): Double = {
    var k = 0
    var m = 0
    var freq = 0.0
    while (m < pa.length && k < pb.length) {
      val i = pa(m)
      while (k < pb.length && pb(k) <= i) k += 1
      if (k < pb.length) {
        val j = pb(k)
        val nextA = if (m + 1 < pa.length) pa(m + 1) else Int.MaxValue
        if (nextA >= j) freq += 1.0 / (1.0 + (j - i - 1))
      }
      m += 1
    }
    freq
  }

  /** Count of minimal unordered intervals over two DISTINCT terms: in the
    * merged ascending stream of a- and b-positions, every ADJACENT pair of
    * opposite type is a minimal interval (anything wider contains it), and
    * `maxgaps` keeps those with gap <= maxgaps
    * (UnorderedIntervalsSource.java + FilteredIntervalsSource.maxGaps). */
  def unorderedMaxgapsCount(pa: Array[Int], pb: Array[Int], maxgaps: Int): Int = {
    var ia = 0
    var ib = 0
    var prevPos = -1
    var prevIsA = false
    var havePrev = false
    var count = 0
    while (ia < pa.length || ib < pb.length) {
      val takeA = ib >= pb.length || (ia < pa.length && pa(ia) < pb(ib))
      val pos = if (takeA) pa(ia) else pb(ib)
      if (takeA) ia += 1 else ib += 1
      if (havePrev && prevIsA != takeA && pos - prevPos - 1 <= maxgaps) count += 1
      prevPos = pos
      prevIsA = takeA
      havePrev = true
    }
    count
  }
}
