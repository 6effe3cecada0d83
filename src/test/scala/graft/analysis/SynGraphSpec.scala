package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** FlattenGraph position semantics of the SynonymGraphFilter analog
  * (`Analyzer.applySynGraph`) — golden expectations derived from how
  * Lucene indexes the flattened graph (SynonymGraphFilter + FlattenGraph:
  * stacked first output token, one flattened position per further token,
  * later tokens shifted by the inserted positions). */
class SynGraphSpec extends AnyFunSuite {

  private def termPos(a: Analyzer, text: String): Seq[(String, Int)] =
    a.analyze(text).map(t => (t.term, t.position)).toSeq

  test("multi-word input contracts onto the first position (keepOrig)") {
    val a = Analyzers.synGraphContract // big table => bigtable
    assert(termPos(a, "a big table row") ==
      Seq(("a", 0), ("big", 1), ("bigtable", 1), ("table", 2), ("row", 3)))
    // invert length: stacked token repeats position 1 -> 4 counted
    val (_, len) = a.invert("a big table row")
    assert(len == 4)
  }

  test("input adjacency is required") {
    val a = Analyzers.synGraphContract
    assert(termPos(a, "big row table") ==
      Seq(("big", 0), ("row", 1), ("table", 2)))
  }

  test("multi-word output inserts a position and shifts the tail (keepOrig)") {
    val a = Analyzers.synGraphExpand // mergejoin => merge join
    assert(termPos(a, "mergejoin batch") ==
      Seq(("mergejoin", 0), ("merge", 0), ("join", 1), ("batch", 2)))
    // length: positions 0,1,2 -> 3 (the insertion counts, the stack doesn't)
    val (_, len) = a.invert("mergejoin batch")
    assert(len == 3)
  }

  test("two expansions accumulate shift") {
    val a = Analyzers.synGraphExpand
    assert(termPos(a, "mergejoin row mergejoin") ==
      Seq(("mergejoin", 0), ("merge", 0), ("join", 1), ("row", 2),
        ("mergejoin", 3), ("merge", 3), ("join", 4)))
  }

  test("pure replace contraction pulls the tail earlier") {
    val a = Analyzer(simple = true,
      synRules = Seq(SynRule(Seq("big", "table"), Seq("bigtable"), keepOrig = false)))
    assert(termPos(a, "a big table row") ==
      Seq(("a", 0), ("bigtable", 1), ("row", 2)))
  }
}
