package graft.search

import graft.analysis.Analyzer

/** Query AST — the subset of Lucene's query zoo required by the reference
  * query-set shapes (lucene/benchmark/conf/query-terms.txt, query-phrases.txt,
  * query-wildcards.txt): terms, boolean AND/OR/NOT, quoted phrases, prefix /
  * wildcard expansion, synonyms, boosts. */
sealed trait Query extends Serializable

final case class TermQ(term: String) extends Query
/** positions = the analyzed position offset of each term inside the phrase
  * (stop-filtered gaps preserved, like Lucene's QueryParser). */
final case class PhraseQ(terms: Seq[String], positions: Seq[Int]) extends Query
final case class BoolQ(
    must: Seq[Query] = Nil,
    should: Seq[Query] = Nil,
    mustNot: Seq[Query] = Nil,
    minShouldMatch: Int = 0) extends Query
final case class BoostQ(q: Query, boost: Float) extends Query
/** Multi-term expansion queries rewrite to constant-score sets
  * (MultiTermQuery CONSTANT_SCORE rewrite, reference:
  * lucene/core/src/java/org/apache/lucene/search/MultiTermQuery.java:68,94). */
final case class PrefixQ(prefix: String) extends Query
final case class WildcardQ(pattern: String) extends Query
/** Already-expanded constant-score set of terms (internal rewrite target). */
final case class ConstSetQ(terms: Seq[String]) extends Query
/** Terms scored as one pseudo-term (reference:
  * lucene/core/src/java/org/apache/lucene/search/SynonymQuery.java:55-218). */
final case class SynonymQ(terms: Seq[String]) extends Query
case object MatchAllQ extends Query
case object MatchNoneQ extends Query

object Query {

  /** Normalization pass mirroring `BooleanQuery.rewrite`
    * (reference: lucene/core/src/java/org/apache/lucene/search/BooleanQuery.java:194-520):
    * single-clause unwrap, nested flatten, SHOULD dedup, MatchNone
    * propagation, MUST ∩ MUST_NOT -> MatchNone. */
  def rewrite(q: Query): Query = q match {
    case BoostQ(sub, b) =>
      rewrite(sub) match {
        case MatchNoneQ => MatchNoneQ
        case s if b == 1.0f => s
        case BoostQ(s2, b2) => BoostQ(s2, b * b2)
        case s => BoostQ(s, b)
      }
    case BoolQ(must0, should0, mustNot0, msm) =>
      var must = must0.map(rewrite)
      var should = should0.map(rewrite).distinct
      val mustNot = mustNot0.map(rewrite).filterNot(_ == MatchNoneQ).distinct
      // flatten nested pure-should disjunctions into this one
      should = should.flatMap {
        case BoolQ(Nil, innerShould, Nil, 0) => innerShould
        case s => Seq(s)
      }.distinct
      // flatten nested pure-must conjunctions
      must = must.flatMap {
        case BoolQ(innerMust, Nil, Nil, 0) => innerMust
        case m => Seq(m)
      }
      if (must.contains(MatchNoneQ)) return MatchNoneQ
      if (must.exists(m => mustNot.contains(m))) return MatchNoneQ
      if (must.isEmpty && should.isEmpty) return MatchNoneQ
      should = should.filterNot(_ == MatchNoneQ)
      if (must.isEmpty && should.isEmpty) return MatchNoneQ
      if (msm > should.size && must.isEmpty) return MatchNoneQ
      // single-clause unwrap
      if (mustNot.isEmpty && msm <= 1) {
        if (must.size == 1 && should.isEmpty) return must.head
        if (must.isEmpty && should.size == 1) return should.head
      }
      BoolQ(must, should, mustNot, msm)
    case other => other
  }

  /** All index terms the (rewritten) query touches, pre-expansion. */
  def terms(q: Query): Set[String] = q match {
    case TermQ(t) => Set(t)
    case PhraseQ(ts, _) => ts.toSet
    case SynonymQ(ts) => ts.toSet
    case ConstSetQ(ts) => ts.toSet
    case BoolQ(m, s, n, _) => (m ++ s ++ n).flatMap(terms).toSet
    case BoostQ(sub, _) => terms(sub)
    case _ => Set.empty
  }

  def hasExpansions(q: Query): Boolean = q match {
    case _: PrefixQ | _: WildcardQ => true
    case BoolQ(m, s, n, _) => (m ++ s ++ n).exists(hasExpansions)
    case BoostQ(sub, _) => hasExpansions(sub)
    case _ => false
  }

  /** Replace Prefix/Wildcard with ConstSetQ using the expansion function
    * (plan-time term-dictionary walk). */
  def expand(q: Query, expander: Query => Seq[String]): Query = q match {
    case p: PrefixQ => val ts = expander(p); if (ts.isEmpty) MatchNoneQ else ConstSetQ(ts)
    case w: WildcardQ => val ts = expander(w); if (ts.isEmpty) MatchNoneQ else ConstSetQ(ts)
    case BoolQ(m, s, n, msm) => BoolQ(m.map(expand(_, expander)), s.map(expand(_, expander)), n.map(expand(_, expander)), msm)
    case BoostQ(sub, b) => BoostQ(expand(sub, expander), b)
    case other => other
  }
}

/** Recursive-descent parser for the classic query grammar subset
  * (reference grammar: lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/QueryParserBase.java:105):
  *
  *   query   := or ; or := and (OR and)* ; and := not (AND not)*
  *   not     := [NOT] atom [^boost]
  *   atom    := '(' query ')' | '"' phrase '"' | term | prefix* | wild?card
  *
  * Bare juxtaposition = OR (Lucene's default operator). Term text is run
  * through the analyzer; a term analyzing to multiple tokens becomes a
  * phrase, like Lucene's query-time analysis. */
final class QueryParser(analyzer: Analyzer) extends Serializable {

  private sealed trait Tok
  private case class Word(s: String) extends Tok
  private case class Phrase(s: String) extends Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object AND extends Tok
  private case object OR extends Tok
  private case object NOT extends Tok
  private case class Caret(boost: Float) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '"') {
        val j = s.indexOf('"', i + 1)
        val end = if (j < 0) s.length else j
        out += Phrase(s.substring(i + 1, end))
        i = if (j < 0) s.length else j + 1
      } else if (c == '^') {
        var j = i + 1
        while (j < s.length && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
        out += Caret(s.substring(i + 1, j).toFloat)
        i = j
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace && !"()\"^".contains(s.charAt(j))) j += 1
        val w = s.substring(i, j)
        w match {
          case "AND" | "&&" => out += AND
          case "OR" | "||" => out += OR
          case "NOT" | "!" => out += NOT
          case "" => ()
          case _ => out += Word(w)
        }
        i = j
      }
    }
    out.toList
  }

  private var toks: List[Tok] = Nil
  private def peek: Option[Tok] = toks.headOption
  private def pop(): Tok = { val t = toks.head; toks = toks.tail; t }

  def parse(s: String): Query = {
    toks = lex(s)
    if (toks.isEmpty) return MatchNoneQ
    val q = parseOr() match {
      // pure negation: Lucene matches nothing unless anchored; we anchor on
      // MatchAll so `NOT x` means "all docs except x"
      case NegMarker(n) => BoolQ(must = Seq(MatchAllQ), mustNot = Seq(n))
      case other => other
    }
    Query.rewrite(q)
  }

  private def parseOr(): Query = {
    var clauses = List(parseAnd())
    var loop = true
    while (loop) peek match {
      case Some(OR) => pop(); clauses ::= parseAnd()
      case Some(Word(_)) | Some(Phrase(_)) | Some(LP) | Some(NOT) =>
        clauses ::= parseAnd() // bare juxtaposition = OR (default operator)
      case _ => loop = false
    }
    val cs = clauses.reverse
    if (cs.size == 1) cs.head
    else {
      // NOT clauses float up as mustNot
      val (negs, pos) = cs.partition(_.isInstanceOf[NegMarker])
      if (negs.isEmpty) BoolQ(should = cs)
      else if (pos.isEmpty) BoolQ(must = Seq(MatchAllQ), mustNot = negs.map(_.asInstanceOf[NegMarker].q))
      else BoolQ(should = pos, mustNot = negs.map(_.asInstanceOf[NegMarker].q))
    }
  }

  private case class NegMarker(q: Query) extends Query

  private def parseAnd(): Query = {
    var clauses = List(parseNot())
    while (peek.contains(AND)) { pop(); clauses ::= parseNot() }
    val cs = clauses.reverse
    if (cs.size == 1) cs.head
    else {
      val (negs, pos) = cs.partition(_.isInstanceOf[NegMarker])
      if (pos.isEmpty) BoolQ(must = Seq(MatchAllQ), mustNot = negs.map(_.asInstanceOf[NegMarker].q))
      else BoolQ(must = pos, mustNot = negs.map(_.asInstanceOf[NegMarker].q))
    }
  }

  private def parseNot(): Query = peek match {
    case Some(NOT) => pop(); NegMarker(parseAtom())
    case _ => parseAtom()
  }

  private def parseAtom(): Query = {
    val base = pop() match {
      case LP =>
        val q = parseOr()
        if (peek.contains(RP)) pop()
        q
      case Phrase(text) =>
        val toks = analyzer.analyze(text).toSeq
        if (toks.isEmpty) MatchNoneQ
        else if (toks.size == 1) TermQ(toks.head.term)
        else PhraseQ(toks.map(_.term), toks.map(_.position))
      case Word(w) =>
        if (w.endsWith("*") && !w.dropRight(1).contains("*") && !w.contains("?"))
          PrefixQ(analyzer.lowercase(w.dropRight(1)))
        else if (w.contains("*") || w.contains("?"))
          WildcardQ(analyzer.lowercase(w))
        else {
          val toks = analyzer.analyze(w).toSeq
          if (toks.isEmpty) MatchNoneQ
          else if (toks.size == 1) TermQ(toks.head.term)
          else PhraseQ(toks.map(_.term), toks.map(_.position))
        }
      case other =>
        throw new IllegalArgumentException(s"unexpected token $other")
    }
    peek match {
      case Some(Caret(b)) => pop(); BoostQ(base, b)
      case _ => base
    }
  }
}
