package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.analysis.Analyzer
import graft.index.CodeFile
import graft.search._

/** Standing-query matching over a document stream — the lucene/monitor
  * module (percolator) re-expressed for Structured Streaming (reference:
  * lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:
  * `match(Document, MatcherFactory)` evaluates every registered query
  * against each incoming document; CandidateMatcher collects (queryId,
  * docId) matches).
  *
  * Spark shape: the registered queries are a small broadcast list; each
  * micro-batch maps every document through the analyzer once and evaluates
  * all queries against the in-memory token map — map-only, no index, no
  * shuffle, linear in stream volume and embarrassingly parallel at any
  * cluster size. (Lucene's Presearcher optimization — indexing the QUERIES
  * to prune which ones run per doc — is a constant-factor cut of the same
  * map-only work; with query counts in the thousands the simple loop is
  * codegen-friendly and branch-predictable, and the term-set prefilter
  * below covers the common case.)
  *
  * Match semantics are the engine's own: the same rewritten [[Query]] AST,
  * matched per document exactly as the index-backed scorers match it
  * (differential-tested against `GraftSearcher.matchesDS` suite-side).
  */
object QueryMonitor {

  /** One match event: which standing query fired on which document. */
  final case class MatchEvent(repo: String, path: String, commit: String, queryName: String)

  /** Pure per-document matcher over the analyzed (term -> ascending
    * positions) map — the [[graft.search.Scorers]] boolean/phrase semantics
    * without postings. */
  def matches(q0: Query, tf: collection.Map[String, Array[Int]]): Boolean = {
    def go(q: Query): Boolean = q match {
      case TermQ(t) => tf.contains(t)
      case SynonymQ(ts) => ts.exists(tf.contains)
      case ConstSetQ(ts) => ts.exists(tf.contains)
      case BoostQ(sub, _) => go(sub)
      case DisMaxQ(ds, _) => ds.exists(go)
      case MatchAllQ => true
      case MatchNoneQ => false
      case mt: MultiTermQ => tf.keysIterator.exists(mt.matches)
      case BoolQ(must, should, mustNot, msm) =>
        must.forall(go) && !mustNot.exists(go) &&
          (should.isEmpty || should.count(go) >= math.max(msm, if (must.isEmpty) 1 else 0))
      case PhraseQ(terms, offsets, slop) =>
        val lists = terms.zip(offsets).map { case (t, off) =>
          tf.get(t).map(_.map(_ - off)).orNull
        }
        if (lists.exists(_ == null)) false
        else if (slop == 0 || terms.size < 3 || terms.distinct.size != terms.size) {
          // anchored check (exact phrases; 2-term / repeated-term sloppy),
          // mirroring PhraseScorer.anchoredFreq
          lists.head.exists { base =>
            lists.tail.forall { ps =>
              if (slop == 0) java.util.Arrays.binarySearch(ps, base) >= 0
              else {
                val ins = java.util.Arrays.binarySearch(ps, base)
                ins >= 0 || {
                  val ip = -ins - 1
                  (ip < ps.length && ps(ip) - base <= slop) ||
                    (ip > 0 && base - ps(ip - 1) <= slop)
                }
              }
            }
          }
        } else {
          // >= 3 distinct terms: Lucene's window condition via the
          // smallest-covering-range sweep (PhraseScorer.windowFreq)
          val ptr = new Array[Int](lists.size)
          var found = false
          var done = false
          while (!found && !done) {
            var minV = Int.MaxValue; var maxV = Int.MinValue; var minT = -1
            var i = 0
            while (i < lists.size) {
              val v = lists(i)(ptr(i))
              if (v < minV) { minV = v; minT = i }
              if (v > maxV) maxV = v
              i += 1
            }
            if (maxV - minV <= slop) found = true
            else {
              ptr(minT) += 1
              if (ptr(minT) >= lists(minT).length) done = true
            }
          }
          found
        }
      case SpanFirstQ(t, end) =>
        tf.get(t).exists(ps => ps.nonEmpty && ps(0) + 1 <= end)
      case SpanNotQ(inc, excl) =>
        val lists = inc.spanTerms.map(t => tf.get(t).orNull).toArray
        if (lists.exists(_ == null)) false
        else {
          val ex = tf.getOrElse(excl, graft.search.SpanMatch.NO_EXCLUSIONS)
          if (inc.inOrder || inc.spanTerms.distinct.size != inc.spanTerms.size)
            graft.search.SpanMatch.orderedFreq(lists, inc.slop, ex) > 0
          else graft.search.SpanMatch.unorderedFreq(lists, inc.slop, ex) > 0
        }
      case SpanContainingQ(big, little) =>
        val lists = big.spanTerms.map(t => tf.get(t).orNull).toArray
        if (lists.exists(_ == null)) false
        else {
          val cont = tf.getOrElse(little, graft.search.SpanMatch.NO_EXCLUSIONS)
          if (big.inOrder || big.spanTerms.distinct.size != big.spanTerms.size)
            graft.search.SpanMatch.orderedFreq(lists, big.slop,
              graft.search.SpanMatch.NO_EXCLUSIONS, cont) > 0
          else graft.search.SpanMatch.unorderedFreq(lists, big.slop,
            graft.search.SpanMatch.NO_EXCLUSIONS, cont) > 0
        }
      case SpanOrNearQ(slots, slop, inOrder) =>
        val lists = slots.map { ts =>
          val arrs = ts.flatMap(tf.get)
          if (arrs.isEmpty) null
          else if (arrs.size == 1) arrs.head
          else { val a = arrs.toArray.flatten; java.util.Arrays.sort(a); a }
        }.toArray
        if (lists.exists(_ == null)) false
        else {
          val flat = slots.flatten
          if (inOrder || flat.distinct.size != flat.size)
            graft.search.SpanMatch.orderedFreq(lists, slop) > 0
          else graft.search.SpanMatch.unorderedFreq(lists, slop) > 0
        }
      case SpanNearQ(ts, slop, inOrder) =>
        val lists = ts.map(t => tf.get(t).orNull).toArray
        if (lists.exists(_ == null)) false
        else if (inOrder || ts.distinct.size != ts.size)
          graft.search.SpanMatch.orderedFreq(lists, slop) > 0
        else graft.search.SpanMatch.unorderedFreq(lists, slop) > 0
    }
    go(Query.rewrite(q0))
  }

  /** Batch surface: evaluate `queries` against every doc in `docs`. */
  def matchBatch(
      docs: Dataset[CodeFile],
      queries: Seq[(String, Query)],
      analyzer: Analyzer): Dataset[MatchEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qs = queries.map { case (n, q) => (n, Query.rewrite(q)) }
    // cheap prefilter: a query with required terms can only match docs
    // containing them all (multi-term / matchall / pure-should skip it)
    val reqTerms: Seq[(String, Query, Set[String])] = qs.map { case (n, q) =>
      val req = q match {
        case TermQ(t) => Set(t)
        case PhraseQ(ts, _, _) => ts.toSet
        case BoolQ(must, _, _, _) => must.collect { case TermQ(t) => t }.toSet
        case _ => Set.empty[String]
      }
      (n, q, req)
    }
    docs.mapPartitions { it =>
      it.flatMap { f =>
        val (byTerm, _) = analyzer.invert(f.content)
        val tfMap = byTerm.map { case (t, (_, poss)) => t -> poss.toArray }
        reqTerms.iterator.collect {
          case (name, q, req)
              if req.forall(tfMap.contains) && matches(q, tfMap) =>
            MatchEvent(f.repo, f.path, f.commit, name)
        }
      }
    }
  }

  /** One presearch outcome: the query was a CANDIDATE for the doc (its
    * extracted term disjunction intersected the doc's tokens); `matched`
    * says whether the full matcher then confirmed it. */
  final case class PresearchEvent(path: String, queryName: String, matched: Boolean)

  /** TermFilteredPresearcher term extraction (reference: lucene/monitor/
    * src/java/org/apache/lucene/monitor/TermFilteredPresearcher.java +
    * QueryAnalyzer.java; default weightor TermWeightor.java:37,139-151:
    * weight(t) = 4 − 3·e^(−0.3·min(len,31)), longer terms weigh more):
    * a conjunction keeps only its single best-weighted child's term set, a
    * disjunction unions all children — the minimal covering disjunction
    * that's guaranteed to be present in any matching doc. Ties break toward
    * the lexicographically greater term (deterministic stand-in for
    * Lucene's hash tiebreak). Empty set = ANYTOKEN: the query can't be
    * term-filtered and every doc stays a candidate. */
  def presearchTerms(q0: Query): Set[String] = {
    def weight(t: String): Double =
      4.0 - 3.0 * math.exp(-0.3 * math.min(t.length, 31))
    def setKey(s: Set[String]): (Double, String) =
      (if (s.isEmpty) Double.MinValue else s.map(weight).min,
        s.toSeq.sorted.mkString(","))
    def go(q: Query): Set[String] = q match {
      case TermQ(t) => Set(t)
      case SynonymQ(ts) => ts.toSet
      case ConstSetQ(ts) => ts.toSet
      case BoostQ(sub, _) => go(sub)
      case DisMaxQ(ds, _) =>
        val sets = ds.map(go)
        if (sets.exists(_.isEmpty)) Set.empty else sets.flatten.toSet
      case PhraseQ(ts, _, _) => Set(ts.maxBy(t => (weight(t), t)))
      case BoolQ(must, _, _, _) if must.nonEmpty =>
        must.map(go).filter(_.nonEmpty) match {
          case Seq() => Set.empty
          case nonEmpty => nonEmpty.maxBy(setKey)
        }
      case BoolQ(_, should, _, _) if should.nonEmpty =>
        val sets = should.map(go)
        if (sets.exists(_.isEmpty)) Set.empty else sets.flatten.toSet
      case _ => Set.empty
    }
    go(Query.rewrite(q0))
  }

  /** MultipassTermFilteredPresearcher term extraction (reference:
    * lucene/monitor/src/java/org/apache/lucene/monitor/
    * MultipassTermFilteredPresearcher.java:1-150): pass p of a CONJUNCTION
    * keeps the p-th-best child's covering set (clamped at the last child)
    * instead of only the best one; disjunctions contribute their whole
    * union in every pass. A document is a candidate iff it intersects
    * EVERY pass's set — each pass is independently covering (any matching
    * doc contains a term from each), so multipass candidates ⊆ single-pass
    * candidates with no false negatives, and conjunction-heavy standing
    * sets prune much harder. Pass 0 equals [[presearchTerms]]. */
  def presearchTermsMultipass(q0: Query, passes: Int): Seq[Set[String]] = {
    def weight(t: String): Double =
      4.0 - 3.0 * math.exp(-0.3 * math.min(t.length, 31))
    def setKey(s: Set[String]): (Double, String) =
      (if (s.isEmpty) Double.MinValue else s.map(weight).min,
        s.toSeq.sorted.mkString(","))
    def go(q: Query, p: Int): Set[String] = q match {
      case TermQ(t) => Set(t)
      case SynonymQ(ts) => ts.toSet
      case ConstSetQ(ts) => ts.toSet
      case BoostQ(sub, _) => go(sub, p)
      case DisMaxQ(ds, _) =>
        val sets = ds.map(go(_, p))
        if (sets.exists(_.isEmpty)) Set.empty else sets.flatten.toSet
      case PhraseQ(ts, _, _) =>
        val ranked = ts.distinct.sortBy(t => (weight(t), t)).reverse
        Set(ranked(math.min(p, ranked.length - 1)))
      case BoolQ(must, _, _, _) if must.nonEmpty =>
        val ranked = must.map(go(_, 0)).filter(_.nonEmpty).sortBy(setKey).reverse
        if (ranked.isEmpty) Set.empty
        else ranked(math.min(p, ranked.length - 1))
      case BoolQ(_, should, _, _) if should.nonEmpty =>
        val sets = should.map(go(_, p))
        if (sets.exists(_.isEmpty)) Set.empty else sets.flatten.toSet
      case _ => Set.empty
    }
    (0 until passes).map(p => go(Query.rewrite(q0), p))
  }

  /** One multipass outcome per SINGLE-PASS candidate: whether the tighter
    * multipass prefilter kept it, and whether the full matcher confirmed.
    * The matcher runs only inside the multipass candidate set (every true
    * match survives every covering pass, so nothing is lost). */
  final case class MultipassEvent(
      path: String, queryName: String, candMulti: Boolean, matched: Boolean)

  def presearchMultipassBatch(
      docs: Dataset[CodeFile],
      queries: Seq[(String, Query)],
      analyzer: Analyzer,
      passes: Int = 2): Dataset[MultipassEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qs = queries.map { case (n, q) =>
      (n, Query.rewrite(q), presearchTerms(q), presearchTermsMultipass(q, passes))
    }
    docs.mapPartitions { it =>
      it.flatMap { f =>
        val (byTerm, _) = analyzer.invert(f.content)
        val tfMap = byTerm.map { case (t, (_, poss)) => t -> poss.toArray }
        qs.iterator.collect {
          case (name, q, pre, preM)
              if pre.isEmpty || pre.exists(tfMap.contains) =>
            val multi = preM.forall(s => s.isEmpty || s.exists(tfMap.contains))
            MultipassEvent(f.path, name, multi, multi && matches(q, tfMap))
        }
      }
    }
  }

  /** Presearch + match in one pass: per (doc, query), emit an event iff the
    * query is a candidate for the doc (term prefilter hit, or ANYTOKEN).
    * The caller aggregates candidates vs confirmed matches — the
    * Presearcher's pruning ratio made observable. */
  def presearchBatch(
      docs: Dataset[CodeFile],
      queries: Seq[(String, Query)],
      analyzer: Analyzer): Dataset[PresearchEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qs = queries.map { case (n, q) =>
      (n, Query.rewrite(q), presearchTerms(q))
    }
    docs.mapPartitions { it =>
      it.flatMap { f =>
        val (byTerm, _) = analyzer.invert(f.content)
        val tfMap = byTerm.map { case (t, (_, poss)) => t -> poss.toArray }
        qs.iterator.collect {
          case (name, q, pre) if pre.isEmpty || pre.exists(tfMap.contains) =>
            PresearchEvent(f.path, name, matches(q, tfMap))
        }
      }
    }
  }

  /** Streaming surface: attach the standing queries to a document stream;
    * the result streams (repo, path, commit, queryName) match events. */
  def attach(
      stream: Dataset[CodeFile],
      queries: Seq[(String, Query)],
      analyzer: Analyzer): DataFrame =
    matchBatch(stream, queries, analyzer).toDF()
}
