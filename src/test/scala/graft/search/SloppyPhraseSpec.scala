package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.analysis.Analyzers
import graft.index._

/** >= 3-term sloppy phrases: the smallest-covering-range sweep must decide
  * Lucene's window condition — exists one occurrence per slot whose
  * offset-adjusted positions span <= slop — exactly. Differential oracle:
  * brute-force enumeration of every occurrence combination per doc. */
class SloppyPhraseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Array("ant", "bee", "cat", "dog", "elk")

  private lazy val files = {
    val rnd = new scala.util.Random(99)
    (0 until 400).map { i =>
      val n = 6 + rnd.nextInt(30)
      val content = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      CodeFile("r", f"f$i%04d", "c0", "txt", content)
    }
  }
  private lazy val index =
    IndexBuilder.build(spark.createDataset(files), IndexConfig(numPartitions = 3))
  private lazy val searcher = new GraftSearcher(index)

  /** Brute-force window oracle over the raw token list. */
  private def bruteMatches(terms: Seq[String], slop: Int): Set[String] =
    files.filter { f =>
      val toks = Analyzers.standard.analyze(f.content).toArray
      val occ = terms.map(t => toks.filter(_.term == t).map(_.position))
      occ.forall(_.nonEmpty) && {
        def rec(slot: Int, chosen: List[Int]): Boolean =
          if (slot == terms.size) {
            val adj = chosen.reverse.zipWithIndex.map { case (p, t) => p - t }
            adj.max - adj.min <= slop
          } else occ(slot).exists(p => rec(slot + 1, p :: chosen))
        rec(0, Nil)
      }
    }.map(_.path).toSet

  private def enginePaths(terms: Seq[String], slop: Int): Set[String] = {
    val q = PhraseQ(terms, terms.indices, slop)
    val ids = searcher.matchesDS(q).collect().toSet
    index.docs.filter($"docId".isInCollection(ids)).collect().map(_.path).toSet
  }

  test("3- and 4-term sloppy phrases match the brute-force window oracle") {
    for {
      terms <- Seq(Seq("ant", "bee", "cat"), Seq("dog", "cat", "bee"),
        Seq("ant", "bee", "cat", "dog"))
      slop <- 1 to 3
    } {
      val got = enginePaths(terms, slop)
      val expect = bruteMatches(terms, slop)
      assert(got == expect,
        s"phrase=$terms slop=$slop engine=${got.size} oracle=${expect.size}")
    }
  }

  test("2-term sloppy keeps the anchored (Lucene-identical) match set") {
    for (slop <- 0 to 2) {
      val got = enginePaths(Seq("ant", "bee"), slop)
      val expect = bruteMatches(Seq("ant", "bee"), slop)
      assert(got == expect, s"slop=$slop")
    }
  }

  test("window sloppy search is rank-identical to the exhaustive oracle") {
    val q = PhraseQ(Seq("ant", "bee", "cat"), Seq(0, 1, 2), 2)
    assert(searcher.search(q, 10).toSeq == searcher.bruteForce(q, 10).toSeq)
  }

  test("repeated-term phrases fall back to anchored matching (documented)") {
    // "ant bee ant"~1: the fallback requires each non-lead slot within slop
    // of its anchored position — just assert it runs and matches a subset
    // of the unordered window relaxation
    val q = PhraseQ(Seq("ant", "bee", "ant"), Seq(0, 1, 2), 1)
    val ids = searcher.matchesDS(q).collect().toSet
    val loose = enginePaths(Seq("ant", "bee"), 2)
    val got = index.docs.filter($"docId".isInCollection(ids)).collect().map(_.path).toSet
    assert(got.subsetOf(loose))
  }
}
