package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** GraphOps BFS semantics on a hand-built graph (reference behavior:
  * solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/ShortestPathStream.java
  * collects EVERY shortest path; GatherNodesStream.java gathers distinct
  * per-level nodes). */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  //   a -> b -> d -> f
  //   a -> c -> d      (second shortest a->d->f route via c)
  //   a -> c -> e -> f (same length as via d)
  //   b -> e (shortcut making a->b->e->f a third 3-hop path)
  //   f -> a (cycle back, must not break termination)
  private lazy val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("c", "e"),
    ("d", "f"), ("e", "f"), ("b", "e"), ("f", "a")
  ).toDF("src", "dst")

  test("shortestPaths returns every shortest path, none longer") {
    val got = GraphOps.shortestPaths(edges, "a", "f", maxDepth = 5)
      .select(org.apache.spark.sql.functions.array_join($"path", "->"))
      .as[String].collect().toSet
    assert(got == Set(
      "a->b->d->f", "a->b->e->f", "a->c->d->f", "a->c->e->f"))
  }

  test("unreachable target yields empty result") {
    val e2 = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    assert(GraphOps.shortestPaths(e2, "a", "d", maxDepth = 4).isEmpty)
  }

  test("source == target yields the trivial path") {
    val got = GraphOps.shortestPaths(edges, "a", "a", maxDepth = 3)
      .select($"path").as[Seq[String]].collect()
    assert(got.map(_.mkString("->")).toSet == Set("a"))
  }

  test("maxDepth bounds the walk") {
    assert(GraphOps.shortestPaths(edges, "a", "f", maxDepth = 2).isEmpty)
  }

  test("gather emits distinct next-hop nodes") {
    val frontier = Seq("a", "b").toDF("node")
    val got = GraphOps.gather(frontier, edges, "src", "dst")
      .as[String].collect().toSet
    assert(got == Set("b", "c", "d", "e"))
  }

  test("connectedComponents matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val es = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = es.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      .map(id => id -> {
        // expected label = min node id in the component, restricted to
        // nodes that actually carry an edge (isolated ids never appear)
        val root = find(id.toInt)
        es.flatMap { case (a, b) => Seq(a, b) }
          .filter(x => find(x.toInt) == root).min
      }).toMap
    val got = GraphOps.connectedComponents(es.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("connectedComponents handles a long chain within maxIter") {
    // a 12-node path graph: diameter 11, maxIter must cover it
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 11L).map(_ -> 0L).toMap)
  }
}
