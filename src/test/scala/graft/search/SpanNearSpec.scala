package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.analysis.Analyzers
import graft.index._

/** SpanNear matching (reference:
  * lucene/core/src/java/org/apache/lucene/search/spans/NearSpansOrdered.java,
  * NearSpansUnordered.java) against brute-force enumeration of occurrence
  * chains over the raw token lists: ordered = exists p_1 < ... < p_n with
  * p_n - p_1 - (n-1) <= slop; unordered = exists one occurrence per slot
  * with max - min - (n-1) <= slop. */
class SpanNearSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Array("ant", "bee", "cat", "dog", "elk")

  private lazy val files = {
    val rnd = new scala.util.Random(1234)
    (0 until 400).map { i =>
      val n = 6 + rnd.nextInt(30)
      val content = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      CodeFile("r", f"f$i%04d", "c0", "txt", content)
    }
  }
  private lazy val index =
    IndexBuilder.build(spark.createDataset(files), IndexConfig(numPartitions = 3))
  private lazy val searcher = new GraftSearcher(index)

  private def occ(f: CodeFile, terms: Seq[String]): Seq[Array[Int]] = {
    val toks = Analyzers.standard.analyze(f.content).toArray
    terms.map(t => toks.filter(_.term == t).map(_.position))
  }

  private def bruteOrdered(terms: Seq[String], slop: Int): Set[String] =
    files.filter { f =>
      val os = occ(f, terms)
      os.forall(_.nonEmpty) && {
        def rec(slot: Int, prev: Int, start: Int): Boolean =
          if (slot == terms.size) prev - start - (terms.size - 1) <= slop
          else os(slot).exists(p => p > prev && rec(slot + 1, p, start))
        os.head.exists(p0 => rec(1, p0, p0))
      }
    }.map(_.path).toSet

  private def bruteUnordered(terms: Seq[String], slop: Int): Set[String] =
    files.filter { f =>
      val os = occ(f, terms)
      os.forall(_.nonEmpty) && {
        def rec(slot: Int, chosen: List[Int]): Boolean =
          if (slot == terms.size) chosen.max - chosen.min - (terms.size - 1) <= slop
          else os(slot).exists(p => rec(slot + 1, p :: chosen))
        rec(0, Nil)
      }
    }.map(_.path).toSet

  private def enginePaths(q: Query): Set[String] = {
    val ids = searcher.matchesDS(q).collect().toSet
    index.docs.filter($"docId".isInCollection(ids)).collect().map(_.path).toSet
  }

  test("ordered span-near matches the brute-force chain oracle") {
    for {
      terms <- Seq(Seq("ant", "bee"), Seq("cat", "dog", "elk"),
        Seq("bee", "ant", "cat", "dog"))
      slop <- 0 to 4
    } {
      val got = enginePaths(SpanNearQ(terms, slop, inOrder = true))
      val expect = bruteOrdered(terms, slop)
      assert(got == expect, s"ordered terms=$terms slop=$slop " +
        s"engine=${got.size} oracle=${expect.size}")
    }
  }

  test("ordered span-near with a repeated term binds distinct occurrences") {
    for (slop <- 0 to 3) {
      val terms = Seq("ant", "ant")
      val got = enginePaths(SpanNearQ(terms, slop, inOrder = true))
      val expect = bruteOrdered(terms, slop)
      assert(got == expect, s"repeat slop=$slop")
    }
  }

  test("unordered span-near matches the brute-force window oracle") {
    for {
      terms <- Seq(Seq("ant", "bee"), Seq("cat", "dog", "elk"))
      slop <- 0 to 4
    } {
      val got = enginePaths(SpanNearQ(terms, slop, inOrder = false))
      val expect = bruteUnordered(terms, slop)
      assert(got == expect, s"unordered terms=$terms slop=$slop " +
        s"engine=${got.size} oracle=${expect.size}")
    }
  }

  private def bruteOrSlots(slots: Seq[Seq[String]], slop: Int, inOrder: Boolean): Set[String] =
    files.filter { f =>
      val toks = Analyzers.standard.analyze(f.content).toArray
      val os = slots.map(ts => toks.filter(t => ts.contains(t.term)).map(_.position).sorted)
      os.forall(_.nonEmpty) && {
        if (inOrder) {
          def rec(slot: Int, prev: Int, start: Int): Boolean =
            if (slot == slots.size) prev - start - (slots.size - 1) <= slop
            else os(slot).exists(p => p > prev && rec(slot + 1, p, start))
          os.head.exists(p0 => rec(1, p0, p0))
        } else {
          def rec(slot: Int, chosen: List[Int]): Boolean =
            if (slot == slots.size) chosen.max - chosen.min - (slots.size - 1) <= slop
            else os(slot).exists(p => rec(slot + 1, p :: chosen))
          rec(0, Nil)
        }
      }
    }.map(_.path).toSet

  test("or-slot span-near matches the brute-force oracle, both orders") {
    for {
      slots <- Seq(Seq(Seq("ant", "bee"), Seq("cat", "dog")),
        Seq(Seq("elk"), Seq("ant", "cat"), Seq("bee", "dog")))
      slop <- 0 to 3
      ord <- Seq(true, false)
    } {
      val got = enginePaths(SpanOrNearQ(slots, slop, inOrder = ord))
      val expect = bruteOrSlots(slots, slop, ord)
      assert(got == expect, s"or-slots=$slots slop=$slop ordered=$ord " +
        s"engine=${got.size} oracle=${expect.size}")
    }
  }

  test("single-term slots degenerate to plain span-near") {
    for (slop <- 0 to 3) {
      val a = enginePaths(SpanOrNearQ(Seq(Seq("ant"), Seq("bee")), slop, inOrder = true))
      val b = enginePaths(SpanNearQ(Seq("ant", "bee"), slop, inOrder = true))
      assert(a == b, s"degenerate slop=$slop")
    }
  }

  test("span-first matches the brute-force position filter") {
    for {
      term <- Seq("ant", "cat")
      end <- Seq(1, 3, 8)
    } {
      val got = enginePaths(SpanFirstQ(term, end))
      val expect = files.filter { f =>
        occ(f, Seq(term)).head.exists(_ + 1 <= end)
      }.map(_.path).toSet
      assert(got == expect, s"span-first term=$term end=$end")
    }
  }

  test("span-first freq counts only qualifying occurrences (scored path)") {
    // differential: distributed pruned top-k vs driver-side brute force
    val q = SpanFirstQ("ant", 5)
    val hits = searcher.search(q, 20)
    val brute = searcher.bruteForce(q, 20)
    assert(hits.map(h => (h.docId, h.score)).toSeq ==
      brute.map(h => (h.docId, h.score)).toSeq)
  }

  test("span-containing keeps only greedy chains holding the little term") {
    for {
      terms <- Seq(Seq("ant", "bee"), Seq("cat", "elk"))
      little <- Seq("dog", "cat")
      slop <- Seq(1, 3, 5)
    } {
      val got = enginePaths(SpanContainingQ(SpanNearQ(terms, slop, inOrder = true), little))
      // brute force: per anchor, the greedy chain (first next-term match),
      // kept iff slop holds AND a little occurrence lies in [start, last]
      val expect = files.filter { f =>
        val os = occ(f, terms)
        val ls = occ(f, Seq(little)).head
        os.forall(_.nonEmpty) && os.head.exists { p0 =>
          var prev = p0
          var ok = true
          for (slot <- 1 until terms.size if ok) {
            os(slot).find(_ > prev) match {
              case Some(p) => prev = p
              case None => ok = false
            }
          }
          ok && prev - p0 - (terms.size - 1) <= slop && ls.exists(l => l >= p0 && l <= prev)
        }
      }.map(_.path).toSet
      assert(got == expect, s"containing terms=$terms little=$little slop=$slop")
    }
  }

  test("ordered is a subset of unordered at equal slop") {
    val terms = Seq("dog", "bee", "cat")
    for (slop <- 1 to 3) {
      val o = enginePaths(SpanNearQ(terms, slop, inOrder = true))
      val u = enginePaths(SpanNearQ(terms, slop, inOrder = false))
      assert(o.subsetOf(u), s"slop=$slop ordered ⊄ unordered")
    }
  }
}
