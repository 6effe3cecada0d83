package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Differential oracle for the minimal-interval counters: brute-force
  * enumeration of every (a, b) position pair with the minimality condition
  * checked literally (no a/b strictly inside the interval) vs the linear
  * two-pointer merges in [[Intervals]]. */
class IntervalsSpec extends AnyFunSuite {

  private def bruteOrdered(pa: Array[Int], pb: Array[Int], g: Int): Int =
    (for {
      i <- pa
      j <- pb
      if j > i
      if !pa.exists(x => x > i && x < j)
      if !pb.exists(x => x > i && x < j)
      if j - i - 1 <= g
    } yield (i, j)).length

  private def bruteUnordered(pa: Array[Int], pb: Array[Int], g: Int): Int =
    (for {
      i <- pa
      j <- pb
      lo = math.min(i, j)
      hi = math.max(i, j)
      if hi > lo
      if !pa.exists(x => x > lo && x < hi)
      if !pb.exists(x => x > lo && x < hi)
      if hi - lo - 1 <= g
    } yield (lo, hi)).length

  test("ordered/unordered minimal-interval counts match brute force on random lists") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 500) {
      val n = 1 + rnd.nextInt(12)
      val m = 1 + rnd.nextInt(12)
      // distinct positions split between the two terms (one term per slot)
      val all = rnd.shuffle((0 until 60).toList).take(n + m).sorted
      val mask = rnd.shuffle(List.fill(n)(true) ++ List.fill(m)(false))
      val pa = all.zip(mask).collect { case (p, true) => p }.toArray
      val pb = all.zip(mask).collect { case (p, false) => p }.toArray
      val g = rnd.nextInt(6)
      assert(Intervals.orderedMaxgapsCount(pa, pb, g) === bruteOrdered(pa, pb, g),
        s"ordered pa=${pa.mkString(",")} pb=${pb.mkString(",")} g=$g")
      assert(Intervals.unorderedMaxgapsCount(pa, pb, g) === bruteUnordered(pa, pb, g),
        s"unordered pa=${pa.mkString(",")} pb=${pb.mkString(",")} g=$g")
      val bruteFreq = (for {
        i <- pa
        j <- pb
        if j > i
        if !pa.exists(x => x > i && x < j)
        if !pb.exists(x => x > i && x < j)
      } yield 1.0 / (1.0 + (j - i - 1))).sum
      assert(math.abs(Intervals.orderedSloppyFreq(pa, pb) - bruteFreq) < 1e-12,
        s"sloppyFreq pa=${pa.mkString(",")} pb=${pb.mkString(",")}")
    }
  }

  test("known fixtures") {
    // tk: a . a b  -> ordered minimal: only (2,3); (0,3) contains it
    assert(Intervals.orderedMaxgapsCount(Array(0, 2), Array(3), 5) === 1)
    // gap filter: (2,3) has gap 0
    assert(Intervals.orderedMaxgapsCount(Array(0, 2), Array(3), 0) === 1)
    // a b a: unordered adjacency gives two minimal intervals
    assert(Intervals.unorderedMaxgapsCount(Array(0, 2), Array(1), 2) === 2)
    // no cross pair
    assert(Intervals.orderedMaxgapsCount(Array(5), Array(1), 9) === 0)
    assert(Intervals.unorderedMaxgapsCount(Array(5), Array(1), 9) === 1)
  }
}
