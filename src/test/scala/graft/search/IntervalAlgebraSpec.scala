package graft.search

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The generic minimal-interval algebra against brute-force enumeration on
  * random position lists — minimality, containment, block adjacency. */
class IntervalAlgebraSpec extends AnyFunSuite {
  import Intervals._

  private def randPos(r: Random, n: Int, max: Int): Array[Int] =
    r.shuffle((0 until max).toList).take(n).sorted.toArray

  /** Brute-force minimal ordered pairs: all (i, j) with j = first b after i
    * and next a not before j. */
  private def bruteOrdered(pa: Array[Int], pb: Array[Int]): Seq[Iv] = {
    val cands = for {
      (i, m) <- pa.zipWithIndex
      js = pb.filter(_ > i)
      if js.nonEmpty
      j = js.min
    } yield (m, Iv(i, j))
    cands.collect {
      case (m, iv) if m + 1 >= pa.length || pa(m + 1) >= iv.end => iv
    }.toSeq
  }

  test("ordered matches brute force and the legacy pair counter") {
    val r = new Random(42)
    for (_ <- 0 until 300) {
      val pa = randPos(r, 1 + r.nextInt(8), 40)
      val pb = randPos(r, 1 + r.nextInt(8), 40)
      val alg = ordered(term(pa), term(pb)).toSeq
      assert(alg == bruteOrdered(pa, pb), s"pa=${pa.toList} pb=${pb.toList}")
      assert(alg.count(iv => iv.end - iv.start - 1 <= 2) ==
        orderedMaxgapsCount(pa, pb, 2))
    }
  }

  test("containing / notContaining partition the source; brute-force equal") {
    val r = new Random(7)
    for (_ <- 0 until 300) {
      val pa = randPos(r, 1 + r.nextInt(8), 40)
      val pb = randPos(r, 1 + r.nextInt(8), 40)
      val pk = randPos(r, 1 + r.nextInt(6), 40)
      val src = ordered(term(pa), term(pb))
      val c = containing(src, term(pk)).toSeq
      val nc = notContaining(src, term(pk)).toSeq
      val brute = src.toSeq.partition(iv => pk.exists(p => p >= iv.start && p <= iv.end))
      assert(c == brute._1 && nc == brute._2)
      assert((c ++ nc).sortBy(_.start) == src.toSeq.sortBy(_.start))
    }
  }

  test("containedBy matches brute force") {
    val r = new Random(11)
    for (_ <- 0 until 300) {
      val pa = randPos(r, 1 + r.nextInt(8), 40)
      val pb = randPos(r, 1 + r.nextInt(8), 40)
      val pk = randPos(r, 1 + r.nextInt(6), 40)
      val big = ordered(term(pa), term(pb))
      val got = containedBy(term(pk), big).toSeq
      val brute = pk.filter(p => big.exists(iv => iv.start <= p && p <= iv.end))
        .map(p => Iv(p, p)).toSeq
      assert(got == brute)
      assert(notContainedBy(term(pk), big).toSeq ==
        pk.filterNot(p => big.exists(iv => iv.start <= p && p <= iv.end))
          .map(p => Iv(p, p)).toSeq)
    }
  }

  test("block requires exact adjacency") {
    assert(block(term(Array(1, 5)), term(Array(2, 8))).toSeq == Seq(Iv(1, 2)))
    assert(block(term(Array(3)), term(Array(5))).isEmpty)
    // composes: block of a block (three-term phrase shape)
    val ab = block(term(Array(1, 10)), term(Array(2, 11)))
    assert(block(ab, term(Array(3, 12))).toSeq == Seq(Iv(1, 3), Iv(10, 12)))
  }

  test("maxWidth filters by span") {
    val src = ordered(term(Array(1, 9)), term(Array(4, 12)))
    assert(maxWidth(src, 4).forall(iv => iv.end - iv.start + 1 <= 4))
  }
}
