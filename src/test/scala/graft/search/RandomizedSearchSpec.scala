package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.index._

/** Randomized differential testing (the `SearchEquivalenceTestBase` /
  * `TestWANDScorer.testRandom` idea): hundreds of random query trees over a
  * dense small-vocab corpus, every pruned distributed result compared to the
  * exhaustive single-partition Float oracle. Deterministic seed. */
class RandomizedSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val vocab = Array("ant", "bee", "cat", "dog", "elk", "fox",
    "gnu", "hen", "ibis", "jay", "koi", "lark")

  private lazy val index = {
    val rnd = new scala.util.Random(42)
    val files = (0 until 300).map { i =>
      val n = 5 + rnd.nextInt(40)
      val content = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      CodeFile("r", f"f$i%04d", "c0", "txt", content)
    }
    import spark.implicits._
    IndexBuilder.build(spark.createDataset(files), IndexConfig(numPartitions = 3))
  }
  private lazy val searcher = new GraftSearcher(index)

  private def randomQuery(rnd: scala.util.Random, depth: Int): Query = {
    def term() = TermQ(vocab(rnd.nextInt(vocab.length)))
    if (depth == 0) term()
    else rnd.nextInt(10) match {
      case 0 => term()
      case 1 => BoolQ(must = Seq.fill(1 + rnd.nextInt(2))(randomQuery(rnd, depth - 1)))
      case 2 => BoolQ(should = Seq.fill(2 + rnd.nextInt(3))(randomQuery(rnd, depth - 1)))
      case 3 => BoolQ(
        must = Seq(randomQuery(rnd, depth - 1)),
        mustNot = Seq(term()))
      case 4 =>
        val ts = Seq.fill(2)(vocab(rnd.nextInt(vocab.length)))
        PhraseQ(ts, Seq(0, 1), slop = rnd.nextInt(3))
      case 5 => SynonymQ(Seq.fill(2)(vocab(rnd.nextInt(vocab.length))).distinct)
      case 6 => DisMaxQ(Seq.fill(2)(term()), rnd.nextFloat())
      case 7 => BoolQ(
        should = Seq.fill(3)(term()),
        minShouldMatch = 2)
      case 8 => BoolQ( // ReqOpt: must + should through the block-max path
        must = Seq.fill(1 + rnd.nextInt(2))(randomQuery(rnd, depth - 1)),
        should = Seq.fill(1 + rnd.nextInt(2))(randomQuery(rnd, depth - 1)),
        minShouldMatch = rnd.nextInt(2))
      case 9 => BoolQ( // full shape: must + should + mustNot
        must = Seq(randomQuery(rnd, depth - 1)),
        should = Seq(term(), term()),
        mustNot = Seq(term()))
    }
  }

  test("300 random query trees: pruned distributed == exhaustive oracle") {
    val rnd = new scala.util.Random(7)
    for (i <- 0 until 300) {
      val q = Query.rewrite(randomQuery(rnd, 2))
      val k = Seq(3, 10, 50)(rnd.nextInt(3))
      val dist = searcher.search(q, k, null).toSeq
      val exact = searcher.bruteForce(q, k).toSeq
      assert(dist == exact, s"iteration $i query $q k=$k")
    }
  }

  test("random pagination tiles the ranking under pruning") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 30) {
      val q = Query.rewrite(randomQuery(rnd, 1))
      val all = searcher.search(q, 40, null)
      if (all.length > 20) {
        val p1 = searcher.search(q, 10, null)
        val p2 = searcher.search(q, 10, p1.last)
        assert((p1 ++ p2).toSeq == all.take(20).toSeq, s"query $q")
      }
    }
  }
}
