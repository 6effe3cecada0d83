package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  private def terms(a: Analyzer, text: String): Seq[String] = a.analyze(text).map(_.term).toSeq
  private def termPos(a: Analyzer, text: String): Seq[(String, Int)] =
    a.analyze(text).map(t => (t.term, t.position)).toSeq

  val std = Analyzers.standard
  val en = Analyzers.english

  test("basic word breaks and lowercasing") {
    assert(terms(std, "Hello World FOO") == Seq("hello", "world", "foo"))
    assert(terms(std, "CamelCase stays oneToken") == Seq("camelcase", "stays", "onetoken"))
  }

  test("UAX#29 mid-letter/mid-num joins (golden: StandardTokenizerImpl.jflex semantics)") {
    // '.' between letters joins (MidNumLet), between digits joins
    assert(terms(std, "foo.bar") == Seq("foo.bar"))
    assert(terms(std, "3.14") == Seq("3.14"))
    assert(terms(std, "1,024") == Seq("1,024"))
    // trailing dot does not join
    assert(terms(std, "end.") == Seq("end"))
    // underscore = ExtendNumLet, joins
    assert(terms(std, "foo_bar x2y") == Seq("foo_bar", "x2y"))
    // mixed letter-digit runs chain
    assert(terms(std, "sha256sum") == Seq("sha256sum"))
    // punctuation splits otherwise
    assert(terms(std, "a-b c/d (e)") == Seq("a", "b", "c", "d", "e"))
    // apostrophe between letters joins
    assert(terms(std, "o'neil can't") == Seq("o'neil", "can't"))
  }

  test("CJK ideographs emit one token per codepoint") {
    assert(terms(std, "中文abc") == Seq("中", "文", "abc"))
  }

  test("over-255-char tokens dropped but consume a position") {
    val long = "x" * 300
    assert(termPos(std, s"before $long after") == Seq(("before", 0), ("after", 2)))
  }

  test("stop filter leaves position gaps (FilteringTokenFilter semantics)") {
    // 'the' and 'of' are in the 33-word English set
    assert(termPos(en, "the rise of nations") == Seq(("rise", 1), ("nations", 3)))
    // leading + consecutive stops
    assert(termPos(en, "to be or not to be great") == Seq(("great", 6)))
    // standard analyzer has an EMPTY stop set (StandardAnalyzer.java:50-53)
    assert(termPos(std, "the rise") == Seq(("the", 0), ("rise", 1)))
  }

  test("english stop set has exactly 33 entries") {
    assert(Analyzers.ENGLISH_STOP_WORDS.size == 33)
  }

  test("invert computes tf, positions and field length") {
    val (byTerm, len) = en.invert("the cat and the cat sat")
    // emitted tokens: cat(1) cat(4) sat(5) -> length 3
    assert(len == 3)
    assert(byTerm("cat")._1 == 2)
    assert(byTerm("cat")._2.toSeq == Seq(1, 4))
    assert(byTerm("sat")._2.toSeq == Seq(5))
  }

  test("offsets are codepoint-correct") {
    val toks = std.analyze("ab cd").toSeq
    assert(toks.map(t => (t.startOffset, t.endOffset)) == Seq((0, 2), (3, 5)))
  }

  test("simple analyzer splits on non-alphanumerics only") {
    val s = Analyzers.simple
    assert(terms(s, "Foo.bar_baz 3.14") == Seq("foo", "bar", "baz", "3", "14"))
  }

  test("empty and whitespace-only content") {
    assert(terms(std, "") == Seq())
    assert(terms(std, "   \n\t  ") == Seq())
    assert(std.invert("")._2 == 0)
  }

  test("minimal S-stemmer matches the reference arm-for-arm") {
    // every arm of EnglishMinimalStemmer.java:30-46, incl. the fallthrough
    val cases = Seq(
      "tables" -> "table",   // default: drop final s
      "queries" -> "query",  // ies -> y
      "ties" -> "ty",        // ies -> y fires even for 4-letter words
      "ies" -> "ies",        // len == 3: s[len-3] == 'i' keeps the word
      "values" -> "value",   // case 'e', s[len-3]='u': fallthrough drop-s
      "hashes" -> "hashe",   // case 'e', consonant: fallthrough drop-s
      "goes" -> "goes",      // s[len-3] == 'o': unchanged
      "mass" -> "mass",      // -ss unchanged
      "bus" -> "bus",        // -us unchanged
      "is" -> "is",          // too short
      "gas" -> "ga",         // default arm
      "a1s" -> "a1",         // digits take the default arm too
      "table" -> "table")    // no trailing s
    for ((in, out) <- cases)
      assert(Analyzer.minimalStemEn(in) == out, s"stem($in)")
  }

  test("minimalStem analyzer stems tokens after stop filtering") {
    val a = Analyzers.minimalStem
    assert(terms(a, "tables queries hashes") == Seq("table", "query", "hashe"))
    // stop words are checked pre-stem; positions keep their gaps
    val b = Analyzer(stopWords = Set("the"), simple = true, minimalStem = true)
    val toks = b.analyze("the tables").toSeq
    assert(toks.map(t => (t.term, t.position)) == Seq(("table", 1)))
  }

  test("shingle2 emits word bigrams with the first member's position (ShingleFilter)") {
    val a = Analyzers.shingle2
    assert(termPos(a, "Big Table scan") == Seq(("big_table", 0), ("table_scan", 1)))
    // fewer tokens than the shingle size -> nothing (outputUnigramsIfNoShingles=false)
    assert(terms(a, "lonely") == Seq.empty)
    assert(terms(a, "") == Seq.empty)
    // invert: field length counts emitted shingles, not source words
    val (byTerm, len) = a.invert("a b a b")
    assert(len == 3)
    assert(byTerm("a_b") == ((2, collection.mutable.ArrayBuffer(0, 2))))
    assert(byTerm("b_a")._1 == 1)
    // offsets span both members
    val t = a.analyze("foo bar").next()
    assert(t.startOffset == 0 && t.endOffset == 7)
  }

  test("synonym filter: stacked token at same position, discountOverlaps length") {
    val a = Analyzers.synonymSlowFast
    // 'slow' also emits 'fast' at ITS position; later tokens shift nothing
    assert(termPos(a, "slow table fast") ==
      Seq(("slow", 0), ("fast", 0), ("table", 1), ("fast", 2)))
    val (byTerm, len) = a.invert("slow table fast")
    // stacked token doesn't count toward field length (numOverlap)
    assert(len == 3)
    assert(byTerm("fast")._1 == 2)
    assert(byTerm("fast")._2.toList == List(0, 2))
    assert(byTerm("slow")._1 == 1)
    // non-mapped text passes through untouched
    assert(termPos(a, "fast table") == Seq(("fast", 0), ("table", 1)))
  }

  test("ASCIIFolding: NFD accents strip, Latin specials map by table") {
    // NFD-decomposable diacritics (ASCIIFoldingFilter.java foldToASCII arms)
    assert(Analyzer.foldAscii("tablé") == "table")
    assert(Analyzer.foldAscii("qüery") == "query")
    assert(Analyzer.foldAscii("señor") == "senor")
    assert(Analyzer.foldAscii("çédille") == "cedille")
    assert(Analyzer.foldAscii("å") == "a")
    // table-mapped specials (not NFD-decomposable)
    assert(Analyzer.foldAscii("æon") == "aeon")
    assert(Analyzer.foldAscii("høst") == "host")
    assert(Analyzer.foldAscii("straße") == "strasse")
    assert(Analyzer.foldAscii("þorn") == "thorn")
    assert(Analyzer.foldAscii("łódź") == "lodz")
    assert(Analyzer.foldAscii("œuvre") == "oeuvre")
    // pure-ASCII fast path returns the same instance
    val s = "plain ascii"
    assert(Analyzer.foldAscii(s) eq s)
    // full chain: UAX#29 keeps the accented letter in-token, then folds
    assert(terms(Analyzers.folding, "the TABLÉ and qüery") ==
      Seq("the", "table", "and", "query"))
  }

  test("HTMLStrip: tags blanked, entities decoded, offsets preserved") {
    // equal-length padding: offsets point into the ORIGINAL markup
    val html = "<p class=\"x\">big <b>table</b></p>"
    val toks = Analyzers.htmlStrip.analyze(html).toList
    assert(toks.map(_.term) == List("big", "table"))
    val t = toks(1)
    assert(html.substring(t.startOffset, t.endOffset) == "table")
    // entities decode (named + decimal + hex); unknown entities pass through
    assert(Analyzer.htmlStripPreserve("a &amp; b").split("\\s+").toList == List("a", "&", "b"))
    assert(Analyzer.htmlStripPreserve("a &amp; b").length == "a &amp; b".length)
    assert(Analyzer.htmlStripPreserve("x &lt;tag&gt; y").contains('<'))
    assert(terms(Analyzers.htmlStrip, "q &amp; a &#65; &unknown; z") ==
      Seq("q", "a", "a", "unknown", "z"))
    // unterminated '<' left alone; tokenizer just breaks on it
    assert(terms(Analyzers.htmlStrip, "a < b") == Seq("a", "b"))
    // doc lengths exclude ALL markup: invert counts only text tokens
    val (_, len) = Analyzers.htmlStrip.invert("<html><body class=\"c\">one two</body></html> &amp;")
    assert(len == 2)
  }

  test("CommonGramsFilter: grams stack at first member's position, unigrams intact") {
    val cg = Analyzers.commonGrams
    // 'the' is common: both neighbors gram; 'a' common at the end too
    assert(termPos(cg, "scan the table a") == Seq(
      ("scan", 0), ("scan_the", 0), ("the", 1), ("the_table", 1),
      ("table", 2), ("table_a", 2), ("a", 3)))
    // no common word -> pure unigrams
    assert(termPos(cg, "scan table") == Seq(("scan", 0), ("table", 1)))
    // stacked grams don't inflate the discountOverlaps length
    val (byTerm, len) = cg.invert("the table the")
    assert(len == 3)
    assert(byTerm("the_table")._1 == 1 && byTerm("the_table")._2 == Seq(0))
    assert(byTerm("table_the")._1 == 1 && byTerm("table_the")._2 == Seq(1))
  }
}
