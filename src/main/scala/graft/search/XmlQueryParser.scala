package graft.search

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

/** Lucene XML query syntax (reference:
  * lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/CoreParser.java:77-121
  * wiring + the builders package): a DOM walk mapping query elements onto the
  * engine's AST. Supported subset mirrors the core builders:
  *
  *  - `TermQuery` (builders/TermQueryBuilder.java:32-43)
  *  - `TermsQuery` — analyzed text fanned into SHOULD terms with
  *    minimumNumberShouldMatch (builders/TermsQueryBuilder.java:47-69)
  *  - `MatchAllDocsQuery`
  *  - `BooleanQuery` with `Clause occurs=should|must|mustNot|filter` and
  *    `minimumNumberShouldMatch` (builders/BooleanQueryBuilder.java:44-88);
  *    FILTER renders as a boost-0 MUST — match without score contribution,
  *    the engine's `BooleanClause.Occur.FILTER` rendering (ft_filter_clause)
  *  - `DisjunctionMaxQuery` with `tieBreaker`
  *    (builders/DisjunctionMaxQueryBuilder.java:47-66)
  *  - `SpanNear slop=… inOrder=…` over `SpanTerm` children
  *    (builders/SpanNearBuilder.java:41-55; slop REQUIRED like
  *    `getAttributeOrFail`, inOrder defaults false)
  *  - `SpanFirst end=…` (builders/SpanFirstBuilder.java:37-46)
  *
  * Every element honors the trailing `boost` attribute exactly like each
  * builder's closing BoostQuery step. `fieldName` attributes are accepted
  * and ignored — the engine indexes a single text field, so field
  * inheritance (DOMUtils.getAttributeWithInheritance) is vacuous here.
  * Analysis for TermsQuery is the engine's own query-time analyzer chain
  * (lowercase simple-mode split), matching CoreParser's analyzer plumbing.
  */
object XmlQueryParser {

  def parse(xml: String): Query = {
    val dbf = DocumentBuilderFactory.newInstance()
    // queries are data, never documents with external entities
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    build(doc.getDocumentElement)
  }

  private def children(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
  }

  private def attrF(e: Element, n: String, d: Float): Float = {
    val v = e.getAttribute(n); if (v.isEmpty) d else v.toFloat
  }
  private def attrI(e: Element, n: String, d: Int): Int = {
    val v = e.getAttribute(n); if (v.isEmpty) d else v.toInt
  }
  private def attrBool(e: Element, n: String, d: Boolean): Boolean = {
    val v = e.getAttribute(n); if (v.isEmpty) d else v.toBoolean
  }
  private def text(e: Element): String = {
    val t = e.getTextContent.trim
    require(t.nonEmpty, s"<${e.getTagName}> requires non-blank text")
    t
  }
  private def withBoost(e: Element, q: Query): Query = {
    val b = attrF(e, "boost", 1.0f)
    if (b == 1.0f) q else BoostQ(q, b)
  }

  private def spanTerms(e: Element): Seq[String] = children(e).map { c =>
    require(c.getTagName == "SpanTerm",
      s"only SpanTerm children supported inside <${e.getTagName}>, " +
        s"found <${c.getTagName}>")
    text(c)
  }

  private def build(e: Element): Query = withBoost(e, e.getTagName match {
    case "TermQuery" => TermQ(text(e).toLowerCase)
    case "MatchAllDocsQuery" => MatchAllQ
    case "TermsQuery" =>
      val terms = text(e).toLowerCase.split("[^a-z0-9]+").toSeq
        .filter(_.nonEmpty)
      BoolQ(should = terms.map(TermQ.apply),
        minShouldMatch = attrI(e, "minimumNumberShouldMatch", 0))
    case "BooleanQuery" =>
      var must = Vector.empty[Query]
      var should = Vector.empty[Query]
      var mustNot = Vector.empty[Query]
      children(e).foreach { c =>
        require(c.getTagName == "Clause",
          s"BooleanQuery children must be <Clause>, found <${c.getTagName}>")
        val sub = build(children(c).head)
        c.getAttribute("occurs") match {
          case "" | "should" => should :+= sub
          case "must"        => must :+= sub
          case "mustNot"     => mustNot :+= sub
          case "filter"      => must :+= BoostQ(sub, 0f)
          case other => throw new IllegalArgumentException(
            s"""invalid value for "occurs" attribute of clause: $other""")
        }
      }
      BoolQ(must, should, mustNot,
        attrI(e, "minimumNumberShouldMatch", 0))
    case "DisjunctionMaxQuery" =>
      DisMaxQ(children(e).map(build), attrF(e, "tieBreaker", 0.0f))
    case "SpanNear" =>
      val slop = e.getAttribute("slop")
      require(slop.nonEmpty, "SpanNear requires a slop attribute")
      SpanNearQ(spanTerms(e), slop.toInt,
        inOrder = attrBool(e, "inOrder", d = false))
    case "SpanFirst" =>
      val kids = spanTerms(e)
      require(kids.size == 1, "SpanFirst takes one SpanTerm child")
      SpanFirstQ(kids.head, attrI(e, "end", 1))
    case "SpanPositionRange" =>
      // builders/SpanPositionRangeBuilder.java:37-48 (start/end attrs)
      val kids = spanTerms(e)
      require(kids.size == 1, "SpanPositionRange takes one SpanTerm child")
      SpanPosRangeQ(kids.head, attrI(e, "start", 0), attrI(e, "end", 1))
    case other =>
      throw new IllegalArgumentException(s"unsupported XML query element: <$other>")
  })
}
