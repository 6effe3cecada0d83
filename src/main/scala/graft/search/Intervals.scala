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
/** One minimal interval: inclusive token-position bounds. */
final case class Iv(start: Int, end: Int)

object Intervals {

  // ------------------------------------------------------------------
  // Generic minimal-interval algebra (streams of Iv, sorted by start,
  // pairwise non-nested — the invariant every combinator preserves).
  // Reference: lucene/queries/src/java/org/apache/lucene/queries/intervals/
  // ContainingIntervalsSource.java, ContainedByIntervalsSource.java,
  // NotContainingIntervalsSource.java, BlockIntervalsSource.java,
  // OrderedIntervalsSource.java — re-derived from the minimal-interval
  // semantics (Clarke/Cormack/Burkowski via Vigna) over decoded position
  // lists rather than ported iterator machinery.
  // ------------------------------------------------------------------

  /** A term source: each position is a width-1 interval. */
  def term(ps: Array[Int]): Array[Iv] = ps.map(p => Iv(p, p))

  /** Keep only minimal intervals of a candidate list whose starts strictly
    * increase and ends never decrease (what [[ordered]]/[[block]] emit): a
    * candidate is non-minimal iff a LATER candidate shares its end (the
    * later one starts further right, hence is nested inside it). */
  private def minimalize(cands: Array[Iv]): Array[Iv] = {
    if (cands.length < 2) return cands
    val out = new collection.mutable.ArrayBuffer[Iv](cands.length)
    var i = 0
    while (i < cands.length) {
      if (i + 1 >= cands.length || cands(i + 1).end > cands(i).end) out += cands(i)
      i += 1
    }
    out.toArray
  }

  /** Minimal ordered concatenation of two minimal streams: for each `a`
    * the first `b` strictly after it, nested results pruned — the n-ary
    * generalization of [[orderedMaxgapsCount]]'s enumeration. */
  def ordered(as: Array[Iv], bs: Array[Iv]): Array[Iv] = {
    val cands = new collection.mutable.ArrayBuffer[Iv](as.length)
    var k = 0
    var m = 0
    while (m < as.length) {
      val a = as(m)
      while (k < bs.length && bs(k).start <= a.end) k += 1
      if (k < bs.length) cands += Iv(a.start, bs(k).end)
      m += 1
    }
    minimalize(cands.toArray)
  }

  /** BlockIntervalsSource: `b` must start EXACTLY one position after `a`
    * ends (adjacent, in order, no gap) — the interval spans both. */
  def block(as: Array[Iv], bs: Array[Iv]): Array[Iv] = {
    val cands = new collection.mutable.ArrayBuffer[Iv](math.min(as.length, bs.length))
    var k = 0
    var m = 0
    while (m < as.length) {
      val a = as(m)
      while (k < bs.length && bs(k).start < a.end + 1) k += 1
      if (k < bs.length && bs(k).start == a.end + 1) cands += Iv(a.start, bs(k).end)
      m += 1
    }
    minimalize(cands.toArray)
  }

  /** Does any `b` lie fully inside `a` (inclusive bounds)? Two-pointer over
    * both sorted streams. */
  private def marksContaining(as: Array[Iv], bs: Array[Iv]): Array[Boolean] = {
    val res = new Array[Boolean](as.length)
    var k = 0
    var m = 0
    while (m < as.length) {
      val a = as(m)
      while (k < bs.length && bs(k).start < a.start) k += 1
      // bs(k) is the first b starting at/after a.start; b starts only move
      // right for later a's (a.start increases), so k never rewinds
      res(m) = k < bs.length && bs(k).start >= a.start && bs(k).end <= a.end
      m += 1
    }
    res
  }

  /** ContainingIntervalsSource: intervals of `as` that contain an interval
    * of `bs`. */
  def containing(as: Array[Iv], bs: Array[Iv]): Array[Iv] = {
    val marks = marksContaining(as, bs)
    as.indices.iterator.filter(marks(_)).map(as(_)).toArray
  }

  /** NotContainingIntervalsSource: intervals of `as` containing NO interval
    * of `bs`. */
  def notContaining(as: Array[Iv], bs: Array[Iv]): Array[Iv] = {
    val marks = marksContaining(as, bs)
    as.indices.iterator.filterNot(marks(_)).map(as(_)).toArray
  }

  /** ContainedByIntervalsSource: intervals of `as` lying fully inside some
    * interval of `bs`. Since `bs` is non-nested and start-sorted, only the
    * last b starting at/before a.start can contain a. */
  def containedBy(as: Array[Iv], bs: Array[Iv]): Array[Iv] = {
    val out = new collection.mutable.ArrayBuffer[Iv](as.length)
    var k = -1
    var m = 0
    while (m < as.length) {
      val a = as(m)
      while (k + 1 < bs.length && bs(k + 1).start <= a.start) k += 1
      if (k >= 0 && bs(k).end >= a.end) out += a
      m += 1
    }
    out.toArray
  }

  /** NotContainedByIntervalsSource complement of [[containedBy]]. */
  def notContainedBy(as: Array[Iv], bs: Array[Iv]): Array[Iv] = {
    val in = containedBy(as, bs).toSet
    as.filterNot(in.contains)
  }

  /** FilteredIntervalsSource.maxWidth: keep intervals spanning at most
    * `width` positions. */
  def maxWidth(as: Array[Iv], width: Int): Array[Iv] =
    as.filter(a => a.end - a.start + 1 <= width)

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
