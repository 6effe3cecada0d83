package graft.analysis

/** A token emitted by the analysis chain.
  *
  * `position` is the absolute token position (0-based) after applying
  * position increments — stop-filtered and over-long tokens leave gaps,
  * mirroring Lucene's `FilteringTokenFilter` posIncrement accumulation
  * (reference: lucene/core/src/java/org/apache/lucene/analysis/FilteringTokenFilter.java:50-56)
  * and `StandardTokenizer`'s skippedPositions
  * (reference: lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java:143-166).
  */
final case class Token(term: String, position: Int, startOffset: Int, endOffset: Int,
    /** Per-occurrence payload (`DelimitedPayloadTokenFilter` markup,
      * integer-encoded); -1 = none. */
    payload: Int = -1)

/** Raw token before filters: carries the position increment. */
final case class RawToken(term: String, posIncr: Int, startOffset: Int, endOffset: Int)

/** One synonym-dictionary rule, `input => output`, as parsed from a Solr
  * synonyms file line (reference: lucene/analysis/common/src/java/org/apache/
  * lucene/analysis/synonym/SolrSynonymParser.java:33-61). Multi-word inputs
  * match consecutive token positions; multi-word outputs are emitted with
  * FlattenGraph indexing semantics (see [[Analyzer.applySynGraph]]).
  * `keepOrig` mirrors `SynonymMap.Builder.add`'s includeOrig. */
final case class SynRule(input: Seq[String], output: Seq[String], keepOrig: Boolean = true)

/** UAX#29-subset word-break tokenizer.
  *
  * Re-expresses the behavior of Lucene's `StandardTokenizer` (a JFlex DFA,
  * reference: lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex)
  * as a hand-written scanner over the word-break classes that matter for
  * code/text corpora:
  *
  *  - ALetter / Numeric runs chain together (WB5, WB8, WB9, WB10)
  *  - ExtendNumLet ('_', connector punctuation) joins runs (WB13a/b) —
  *    so `foo_bar` is ONE token
  *  - MidLetter / MidNumLet / single quote join letter runs when surrounded
  *    by letters (WB6/WB7) — `foo.bar`, `o'neil` are ONE token
  *  - MidNum / MidNumLet join digit runs when surrounded by digits
  *    (WB11/WB12) — `3.14`, `1,024` are ONE token
  *  - Han/Hiragana ideographs are emitted as single-codepoint tokens
  *
  * Tokens longer than `maxTokenLength` chars (default 255, matching
  * `StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH`,
  * reference: lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:39)
  * are dropped but still consume one position.
  */
object Tokenizer {

  private final val ALetter = 0
  private final val Numeric = 1
  private final val ExtendNumLet = 2
  private final val MidLetter = 3
  private final val MidNum = 4
  private final val MidNumLet = 5
  private final val Ideographic = 6
  private final val Other = 7
  /** WB4 Extend: combining marks attach to the preceding run character and
    * never break a token — so decomposed text (`e` + U+0301) tokenizes the
    * same way as its precomposed form. Marks cannot START a token. */
  private final val Extend = 8

  private def classify(cp: Int): Int = {
    val gt = Character.getType(cp)
    if (gt == Character.NON_SPACING_MARK || gt == Character.COMBINING_SPACING_MARK ||
        gt == Character.ENCLOSING_MARK) Extend
    else if (cp == '_' || gt == Character.CONNECTOR_PUNCTUATION) ExtendNumLet
    else if (Character.isDigit(cp)) Numeric
    else if (Character.isLetter(cp)) {
      val script = Character.UnicodeScript.of(cp)
      if (script == Character.UnicodeScript.HAN ||
          script == Character.UnicodeScript.HIRAGANA ||
          script == Character.UnicodeScript.KATAKANA ||
          script == Character.UnicodeScript.HANGUL) Ideographic
      else ALetter
    } else cp match {
      case ':' | 0x00B7 | 0x05F4 | 0x2027 => MidLetter
      case ',' | ';' => MidNum
      case '.' | '\'' | 0x2019 => MidNumLet
      case _ => Other
    }
  }

  /** True if `cls` can start or continue the body of a token run. */
  @inline private def isRunClass(cls: Int): Boolean =
    cls == ALetter || cls == Numeric || cls == ExtendNumLet

  def tokenize(text: String, maxTokenLength: Int = 255): Iterator[RawToken] = new Iterator[RawToken] {
    private var i = 0
    private var skipped = 0 // accumulated position increments from dropped tokens
    private var nextTok: RawToken = null
    private val len = text.length
    advance()

    override def hasNext: Boolean = nextTok != null
    override def next(): RawToken = { val t = nextTok; advance(); t }

    private def cpAt(idx: Int): Int = text.codePointAt(idx)

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && i < len) {
        val cp = cpAt(i)
        val cls = classify(cp)
        if (cls == Ideographic) {
          val start = i
          i += Character.charCount(cp)
          emit(text.substring(start, i), start, i)
        } else if (isRunClass(cls)) {
          val start = i
          i += Character.charCount(cp)
          var lastMain = cls // class of the last run-body char consumed
          var done = false
          while (!done && i < len) {
            val c1 = cpAt(i)
            val cls1 = classify(c1)
            if (isRunClass(cls1)) {
              i += Character.charCount(c1); lastMain = cls1
            } else if (cls1 == Extend) {
              // WB4: the mark extends the run; the run class is unchanged
              i += Character.charCount(c1)
            } else if (cls1 == MidLetter || cls1 == MidNum || cls1 == MidNumLet) {
              // WB6/7 + WB11/12: mid char joins only when surrounded by the
              // right class on both sides.
              val j = i + Character.charCount(c1)
              if (j < len) {
                val c2 = cpAt(j)
                val cls2 = classify(c2)
                val joinsLetters = (cls1 == MidLetter || cls1 == MidNumLet) &&
                  lastMain == ALetter && cls2 == ALetter
                val joinsDigits = (cls1 == MidNum || cls1 == MidNumLet) &&
                  lastMain == Numeric && cls2 == Numeric
                if (joinsLetters || joinsDigits) {
                  i = j + Character.charCount(c2); lastMain = cls2
                } else done = true
              } else done = true
            } else done = true
          }
          emit(text.substring(start, i), start, i)
        } else {
          i += Character.charCount(cp)
        }
      }
    }

    private def emit(term: String, start: Int, end: Int): Unit = {
      if (term.length > maxTokenLength) {
        // over-long token: dropped but still consumes a position
        skipped += 1
      } else {
        nextTok = RawToken(term, skipped + 1, start, end)
        skipped = 0
      }
    }
  }
}

/** Analyzer = Tokenizer -> LowerCaseFilter -> StopFilter composition,
  * mirroring `StandardAnalyzer`
  * (reference: lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:81-95).
  *
  * `simple = true` switches to a trivial split-on-non-alphanumeric
  * tokenizer (lowercase, `[a-z0-9]+` runs). This mode exists so that the
  * driver-facing oracle queries have an exactly-SQL-expressible analyzer
  * (DuckDB `string_split_regex(lower(text),'[^a-z0-9]+')`); the engine
  * itself defaults to the UAX#29 subset.
  */
final case class Analyzer(
    stopWords: Set[String] = Set.empty,
    maxTokenLength: Int = 255,
    simple: Boolean = false,
    minimalStem: Boolean = false,
    /** Full Porter stemming — the reference's `EnglishAnalyzer` default
      * chain applies `PorterStemFilter` after stop filtering (reference:
      * lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:106-113).
      * See [[PorterStemmer]]. */
    porterStem: Boolean = false,
    /** `KeywordRepeatFilter` + stemmer + `RemoveDuplicatesTokenFilter`
      * (reference: lucene/analysis/common/src/java/org/apache/lucene/
      * analysis/miscellaneous/KeywordRepeatFilter.java:1-60 +
      * RemoveDuplicatesTokenFilter.java): each token emits its ORIGINAL
      * surface form plus its stem STACKED at the same position
      * (posIncrement 0) unless the stem equals the original (the
      * remove-duplicates pass). Requires `minimalStem` or `porterStem`. */
    stemKeepOriginal: Boolean = false,
    /** `LengthFilter` (reference: lucene/analysis/common/src/java/org/
      * apache/lucene/analysis/miscellaneous/LengthFilter.java:1-60): drop
      * tokens whose length falls outside [lengthMin, lengthMax], leaving
      * position gaps like every FilteringTokenFilter. Defaults pass
      * everything. */
    lengthMin: Int = 0,
    lengthMax: Int = Int.MaxValue,
    /** > 1 composes word n-grams after the filter chain — Lucene
      * `ShingleFilter` with outputUnigrams=false, '_' separator (reference:
      * lucene/analysis/common/src/java/org/apache/lucene/analysis/shingle/ShingleFilter.java:
      * TOKEN_SEPARATOR :77, position = first member's position). A doc with
      * fewer than `shingleSize` tokens emits nothing
      * (outputUnigramsIfNoShingles=false default, :121-124). */
    shingleSize: Int = 0,
    /** `WordDelimiterGraphFilter` subset for code identifiers (reference:
      * lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java):
      * GENERATE_WORD_PARTS + SPLIT_ON_CASE_CHANGE + PRESERVE_ORIGINAL, with
      * SPLIT_ON_NUMERICS off. A camelCase token `sparkQuery` emits the
      * original (lowercased, at its own position), the first part at the
      * SAME position (posIncrement 0 — a stacked/overlap token, WDGF's graph
      * semantics flattened the way FlattenGraphFilter does for indexing),
      * and each later part one position on. Unsplit tokens pass through. */
    wordDelimiter: Boolean = false,
    /** Index-time synonym injection — `SynonymGraphFilter` with
      * single-token rules, flattened for indexing the way
      * `FlattenGraphFilter` does (reference: lucene/analysis/common/src/
      * java/org/apache/lucene/analysis/synonym/SynonymGraphFilter.java:73-88,
      * SynonymMap keepOrig=true): each mapped term also emits its synonym
      * at the SAME position (posIncrement 0). Stacked tokens don't count
      * toward the field length (discountOverlaps, see [[invert]]), phrase
      * queries match through either surface form, and tf/df of the synonym
      * term absorb the mapped occurrences — Lucene's exact semantics. */
    synonyms: Map[String, String] = Map.empty,
    /** Full `SynonymGraphFilter` + `FlattenGraphFilter` indexing analog
      * (reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
      * synonym/SynonymGraphFilter.java:73-88 + core/.../FlattenGraphFilter.java):
      * multi-word inputs consume consecutive positions, multi-word outputs
      * stack their first token (posIncrement 0) and advance one position per
      * further token — shifting every later token, exactly what the
      * flattened graph looks like to the indexer. Applied greedily
      * longest-input-first at each position, like the synonym FST's
      * longest-match scan. */
    synRules: Seq[SynRule] = Nil,
    /** `CJKBigramFilter` (reference: lucene/analysis/common/src/java/org/
      * apache/lucene/analysis/cjk/CJKBigramFilter.java:1-350, HAN flag):
      * consecutive single-codepoint Han/Hiragana tokens (what the UAX#29
      * tokenizer emits for ideographs) combine into overlapping bigrams;
      * an unpaired ideograph stays a unigram; non-CJK tokens pass through.
      * Positions are renumbered contiguously over the emitted stream —
      * each bigram takes one position (outputUnigrams=false default), so
      * a k-char run contributes k-1 to the field length. */
    cjkBigram: Boolean = false,
    /** Dictionary longest-match CJK segmentation with bigram fallback for
      * OOV spans ([[Analyzer.cjkDictSegment]] — the kuromoji-lite chain).
      * Non-empty set switches the CJK stage from pure bigrams to
      * dictionary-first segmentation; the dictionary broadcasts with the
      * analyzer (a few MB for a real lexicon — executor-local, never a
      * shuffle). */
    cjkDictWords: Set[String] = Set.empty,
    /** `DelimitedPayloadTokenFilter` analog (reference: lucene/analysis/
      * common/src/java/org/apache/lucene/analysis/payloads/
      * DelimitedPayloadTokenFilter.java:30-80 with IntegerEncoder):
      * tokens carrying `term<delim>payload` markup split into the term
      * (which continues through the chain) and an integer payload stored
      * per occurrence in the postings (posEnc payload interleaving).
      * ' ' = off. Pair with [[whitespaceTok]] like the reference
      * pairs the filter with WhitespaceTokenizer — a word-break tokenizer
      * would split at the delimiter. */
    payloadDelimiter: Char = ' ',
    /** WhitespaceTokenizer analog: split on whitespace only, keeping
      * punctuation (and payload delimiters) inside tokens. */
    whitespaceTok: Boolean = false,
    /** `HTMLStripCharFilter` subset (reference: lucene/analysis/common/src/
      * java/org/apache/lucene/analysis/charfilter/HTMLStripCharFilter.jflex —
      * tags removed, character entities decoded, before tokenization): a
      * char-filter pre-pass that blanks `<...>` tag spans and decodes the
      * core named/numeric entities. Each removed span is replaced by an
      * EQUAL-length run of spaces, so token offsets keep pointing into the
      * original markup without the reference's offset-correction machinery.
      * Documented deviation: a decoded entity char does not join an
      * adjacent word across the padding gap (`abc&#97;def` tokenizes as
      * `abc a def`, not `abcadef`) — entities at word boundaries, the
      * overwhelmingly common case, behave identically. */
    htmlStrip: Boolean = false,
    /** `CommonGramsFilter` (reference: lucene/analysis/common/src/java/org/
      * apache/lucene/analysis/commongrams/CommonGramsFilter.java): unigrams
      * pass through unchanged; every adjacent pair whose FIRST or SECOND
      * member is a common word additionally emits the gram `a_b`
      * (GRAM_TYPE, '_' separator :47) STACKED at the first member's
      * position (posIncrement 0 — :139-149), so grams never inflate the
      * discountOverlaps field length and phrase queries over stopword pairs
      * collapse to one cheap term lookup (CommonGramsQueryFilter). */
    commonWords: Set[String] = Set.empty,
    /** `ASCIIFoldingFilter` subset (reference: lucene/analysis/common/src/
      * java/org/apache/lucene/analysis/miscellaneous/ASCIIFoldingFilter.java:
      * foldToASCII) applied per-term after LowerCaseFilter: NFD-decomposable
      * accents are stripped (é→e, ü→u, ñ→n, ç→c, å→a …) and the common
      * non-decomposable Latin specials are mapped by table (æ→ae, œ→oe,
      * ø→o, ß→ss, þ→th, ð/đ→d, ł→l). */
    asciiFold: Boolean = false,
    /** Snowball German stemming ([[GermanStemmer]]) — the reference's
      * `GermanAnalyzer` stem step. Mutually exclusive with the English
      * stemmers; applied at the same point in the chain. */
    germanStem: Boolean = false,
    /** `FrenchMinimalStemFilter` analog ([[Analyzer.minimalStemFr]]) —
      * the reference's minimal French stemmer (lucene/analysis/common/src/
      * java/org/apache/lucene/analysis/fr/FrenchMinimalStemFilter.java,
      * from Savoy, "Light Stemming Approaches for French, Portuguese,
      * German and Hungarian Languages", SAC 2006). */
    frenchMinimalStem: Boolean = false,
    /** `ICUFoldingFilter` analog (reference: lucene/analysis/icu/src/java/
      * org/apache/lucene/analysis/icu/ICUFoldingFilter.java:1-120 — NFKC
      * normalization + Unicode case folding + UTR#30 diacritic/width
      * foldings, all in one filter): NFKC compatibility-normalizes the term
      * (width folding ｆｕｌｌ→full, ligatures ﬁ→fi, circled/compat forms),
      * re-lowercases codepoint-wise (NFKC can surface new uppercase), then
      * applies the accent-strip + Latin-specials fold ([[Analyzer.foldAscii]]).
      * Supersedes `asciiFold` when both are set. */
    icuFold: Boolean = false) extends Serializable {

  require(synonyms.isEmpty || !stemKeepOriginal,
    "stemKeepOriginal + single-token synonyms is unsupported: the keyword-" +
      "repeat branch would bypass synonym expansion on stemmed tokens " +
      "(compose via synRules instead)")

  /** Codepoint-wise lowercase, mirroring Lucene `LowerCaseFilter`
    * (reference: lucene/core/src/java/org/apache/lucene/analysis/LowerCaseFilter.java:27-47).
    * Deliberately NOT `String.toLowerCase` (locale/special-casing differs).
    */
  def lowercase(s: String): String = {
    var needs = false
    var k = 0
    while (k < s.length && !needs) {
      val cp = s.codePointAt(k)
      if (Character.toLowerCase(cp) != cp) needs = true
      k += Character.charCount(cp)
    }
    if (!needs) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        sb.appendCodePoint(Character.toLowerCase(cp))
        j += Character.charCount(cp)
      }
      sb.toString
    }
  }

  /** Runs over an ALREADY-LOWERCASED string (see [[analyze]]): lower-then-
    * extract matches the DuckDB oracle's `regexp_extract_all(lower(text),
    * '[a-z0-9]+')` order of operations — characters whose Unicode lowercase
    * maps into [a-z] (e.g. U+212A KELVIN SIGN -> 'k') are token characters
    * in both engines. */
  private def simpleTokens(text: String): Iterator[RawToken] = new Iterator[RawToken] {
    private var i = 0
    private val len = text.length
    private var s = -1
    private var e = -1
    findNext()
    @inline private def isTokChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    private def findNext(): Unit = {
      s = -1
      while (i < len && !isTokChar(text.charAt(i))) i += 1
      if (i < len) { s = i; while (i < len && isTokChar(text.charAt(i))) i += 1; e = i }
    }
    override def hasNext: Boolean = s >= 0
    override def next(): RawToken = { val t = RawToken(text.substring(s, e), 1, s, e); findNext(); t }
  }

  /** WhitespaceTokenizer analog: maximal non-whitespace runs, punctuation
    * kept inside tokens (the tokenizer the reference pairs with
    * DelimitedPayloadTokenFilter). */
  private def whitespaceTokens(text: String): Iterator[RawToken] = new Iterator[RawToken] {
    private var i = 0
    private val len = text.length
    private var s = -1
    private var e = -1
    findNext()
    private def findNext(): Unit = {
      s = -1
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < len) { s = i; while (i < len && !Character.isWhitespace(text.charAt(i))) i += 1; e = i }
    }
    override def hasNext: Boolean = s >= 0
    override def next(): RawToken = { val t = RawToken(text.substring(s, e), 1, s, e); findNext(); t }
  }

  /** Case-preserving `[A-Za-z0-9]+` runs — the tokenizer feeding the
    * word-delimiter chain (case information must survive to the splitter;
    * lowercasing happens per-term afterwards, same net effect on this
    * ASCII-alnum charset as the lower-then-extract order `simple` uses). */
  private def caseTokens(text: String): Iterator[RawToken] = new Iterator[RawToken] {
    private var i = 0
    private val len = text.length
    private var s = -1
    private var e = -1
    findNext()
    @inline private def isTokChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
    private def findNext(): Unit = {
      s = -1
      while (i < len && !isTokChar(text.charAt(i))) i += 1
      if (i < len) { s = i; while (i < len && isTokChar(text.charAt(i))) i += 1; e = i }
    }
    override def hasNext: Boolean = s >= 0
    override def next(): RawToken = { val t = RawToken(text.substring(s, e), 1, s, e); findNext(); t }
  }

  /** WordDelimiterGraphFilter expansion of one raw token: split on
    * lower/digit→UPPER case transitions (SPLIT_ON_CASE_CHANGE); when a split
    * happens, emit the preserved original first (inheriting the token's
    * posIncrement), then the first part as a stacked token (posIncrement 0)
    * and each later part with posIncrement 1 — so part positions coincide
    * with the positions the parts would have had as standalone words, and
    * phrase queries over parts keep working (reference:
    * WordDelimiterGraphFilter.java sortedness + FlattenGraphFilter). */
  private def wdExpand(rt: RawToken): Iterator[RawToken] = {
    val t = rt.term
    var hasSplit = false
    var k = 1
    while (k < t.length && !hasSplit) {
      if (t.charAt(k) >= 'A' && t.charAt(k) <= 'Z' &&
          !(t.charAt(k - 1) >= 'A' && t.charAt(k - 1) <= 'Z')) hasSplit = true
      k += 1
    }
    if (!hasSplit) Iterator.single(rt)
    else {
      val parts = collection.mutable.ArrayBuffer.empty[RawToken]
      var start = 0
      var j = 1
      while (j <= t.length) {
        val boundary = j == t.length ||
          (t.charAt(j) >= 'A' && t.charAt(j) <= 'Z' &&
            !(t.charAt(j - 1) >= 'A' && t.charAt(j - 1) <= 'Z'))
        if (boundary) {
          parts += RawToken(t.substring(start, j), if (start == 0) 0 else 1,
            rt.startOffset + start, rt.startOffset + j)
          start = j
        }
        j += 1
      }
      Iterator.single(rt) ++ parts.iterator
    }
  }

  /** Full analysis chain: returns tokens with absolute positions. */
  def analyze(text: String): Iterator[Token] = {
    val src = if (htmlStrip) Analyzer.htmlStripPreserve(text) else text
    val raw =
      if (whitespaceTok) whitespaceTokens(src)
      else if (wordDelimiter) caseTokens(src).flatMap(wdExpand)
      else if (simple) simpleTokens(lowercase(src))
      else Tokenizer.tokenize(src, maxTokenLength)
    var pos = -1
    var pendingGap = 0 // posIncrements accumulated from stop-filtered tokens
    val base = raw.flatMap { rt0 =>
      // DelimitedPayloadTokenFilter: strip `<delim><digits>` markup off the
      // surface BEFORE any other filter; the payload rides on the token.
      // Allocation-free when no delimiter is configured (the hot path).
      var rt = rt0
      var pay = -1
      if (payloadDelimiter != ' ') {
        val idx = rt0.term.lastIndexOf(payloadDelimiter.toInt)
        if (idx > 0 && idx < rt0.term.length - 1 &&
            rt0.term.substring(idx + 1).forall(c => c >= '0' && c <= '9')) {
          rt = rt0.copy(term = rt0.term.substring(0, idx))
          pay = rt0.term.substring(idx + 1).toInt
        }
      }
      val lowered = lowercase(rt.term)
      val term =
        if (icuFold) Analyzer.foldIcu(lowered)
        else if (asciiFold) Analyzer.foldAscii(lowered)
        else lowered
      if (stopWords.contains(term) ||
          term.length < lengthMin || term.length > lengthMax) {
        pendingGap += rt.posIncr
        Iterator.empty
      } else {
        pos += rt.posIncr + pendingGap
        pendingGap = 0
        val out =
          if (porterStem) PorterStemmer.stem(term)
          else if (minimalStem) Analyzer.minimalStemEn(term)
          else if (germanStem) GermanStemmer.stem(term)
          else if (frenchMinimalStem) Analyzer.minimalStemFr(term)
          else term
        val tok = Token(out, pos, rt.startOffset, rt.endOffset, pay)
        if (stemKeepOriginal && out != term) {
          // keyword-repeat: original first, stem stacked (posInc 0)
          Iterator(Token(term, pos, rt.startOffset, rt.endOffset), tok)
        } else synonyms.get(out) match {
          case Some(syn) =>
            Iterator(tok, Token(syn, pos, rt.startOffset, rt.endOffset))
          case None => Iterator.single(tok)
        }
      }
    }
    val stream0 = if (synRules.isEmpty) base else Analyzer.applySynGraph(base, synRules)
    val stream =
      if (cjkDictWords.nonEmpty) Analyzer.cjkDictSegment(stream0, cjkDictWords)
      else if (cjkBigram) Analyzer.cjkBigrams(stream0)
      else stream0
    if (shingleSize > 1) stream.sliding(shingleSize).withPartial(false).map { w =>
      Token(w.iterator.map(_.term).mkString("_"),
        w.head.position, w.head.startOffset, w.last.endOffset)
    }
    else if (commonWords.isEmpty) stream
    else {
      // CommonGramsFilter: interleave each gram right after its first
      // member so positions stay nondecreasing for invert's length count.
      val toks = stream.toArray
      toks.iterator.zipWithIndex.flatMap { case (a, i) =>
        val gram =
          if (i + 1 < toks.length) {
            val b = toks(i + 1)
            if ((commonWords.contains(a.term) || commonWords.contains(b.term)) &&
                b.position == a.position + 1)
              Iterator.single(
                Token(a.term + "_" + b.term, a.position, a.startOffset, b.endOffset))
            else Iterator.empty
          } else Iterator.empty
        Iterator.single(a) ++ gram
      }
    }
  }

  /** Per-(term) stats for one document: (term -> (tf, positions)) plus the
    * field length with discountOverlaps semantics: Lucene counts
    * `state.length - state.numOverlap`, where an overlap is a token whose
    * posIncrement is 0 — i.e. one stacked at the previous token's position
    * (the word-delimiter chain produces these; every other chain's positions
    * strictly increase, so length == emitted token count there.
    * Reference: lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:116-126,
    * FieldInvertState.java numOverlap accounting).
    */
  /** Whether this chain can attach payloads to tokens — lets the indexer
    * skip payload bookkeeping entirely on the (overwhelmingly common)
    * payload-free path. */
  def carriesPayloads: Boolean = payloadDelimiter != ' '

  /** [[invert]] plus per-occurrence payloads (third buffer, aligned with
    * positions; -1 = none) — the indexer's entry point when the chain can
    * carry payload markup. */
  def invertFull(text: String): (collection.mutable.LinkedHashMap[String, (Int, collection.mutable.ArrayBuffer[Int], collection.mutable.ArrayBuffer[Int])], Int) = {
    val byTerm = collection.mutable.LinkedHashMap.empty[String, (Int, collection.mutable.ArrayBuffer[Int], collection.mutable.ArrayBuffer[Int])]
    var length = 0
    var prevPos = -1
    analyze(text).foreach { t =>
      if (t.position != prevPos) length += 1
      prevPos = t.position
      byTerm.get(t.term) match {
        case Some((tf, poss, pays)) =>
          poss += t.position
          pays += t.payload
          byTerm.update(t.term, (tf + 1, poss, pays))
        case None =>
          val poss = new collection.mutable.ArrayBuffer[Int](4)
          val pays = new collection.mutable.ArrayBuffer[Int](4)
          poss += t.position
          pays += t.payload
          byTerm.update(t.term, (1, poss, pays))
      }
    }
    (byTerm, length)
  }

  def invert(text: String): (collection.mutable.LinkedHashMap[String, (Int, collection.mutable.ArrayBuffer[Int])], Int) = {
    val byTerm = collection.mutable.LinkedHashMap.empty[String, (Int, collection.mutable.ArrayBuffer[Int])]
    var length = 0
    var prevPos = -1
    analyze(text).foreach { t =>
      if (t.position != prevPos) length += 1
      prevPos = t.position
      byTerm.get(t.term) match {
        case Some((tf, poss)) =>
          poss += t.position
          byTerm.update(t.term, (tf + 1, poss))
        case None =>
          val poss = new collection.mutable.ArrayBuffer[Int](4)
          poss += t.position
          byTerm.update(t.term, (1, poss))
      }
    }
    (byTerm, length)
  }
}

object Analyzer {

  /** Is this token a single ideograph the way [[Tokenizer]] emits them? */
  private def isCjkSingle(term: String): Boolean = {
    if (term.codePointCount(0, term.length) != 1) return false
    val script = Character.UnicodeScript.of(term.codePointAt(0))
    // CJKBigramFilter's default flag set: HAN | HIRAGANA | KATAKANA | HANGUL
    script == Character.UnicodeScript.HAN ||
      script == Character.UnicodeScript.HIRAGANA ||
      script == Character.UnicodeScript.KATAKANA ||
      script == Character.UnicodeScript.HANGUL
  }

  /** `CJKBigramFilter` over an already-positioned stream: runs of adjacent
    * single-ideograph tokens become overlapping bigrams (a lone ideograph
    * stays a unigram), everything else passes through. Positions renumber
    * only by the per-run shrinkage (a k-char run emits k-1 bigrams, so
    * everything after it shifts left by one per run) — pass-through tokens
    * PRESERVE their incoming position gaps, matching the reference filter's
    * posIncrement passthrough (round-4 advice; on a gap-free stream this
    * equals the previous contiguous renumbering exactly). */
  def cjkBigrams(toks: Iterator[Token]): Iterator[Token] = {
    val arr = toks.toArray
    val out = collection.mutable.ArrayBuffer.empty[Token]
    var shift = 0
    var i = 0
    while (i < arr.length) {
      val t = arr(i)
      if (!isCjkSingle(t.term)) {
        out += t.copy(position = t.position - shift); i += 1
      } else {
        // extend the run of position-adjacent ideograph singles
        var j = i + 1
        while (j < arr.length && isCjkSingle(arr(j).term) &&
               arr(j).position == arr(j - 1).position + 1) j += 1
        val base = t.position - shift
        if (j - i == 1) {
          out += t.copy(position = base)
        } else {
          var k = i
          while (k < j - 1) {
            out += Token(arr(k).term + arr(k + 1).term, base + (k - i),
              arr(k).startOffset, arr(k + 1).endOffset)
            k += 1
          }
          shift += 1 // k singles -> k-1 bigrams
        }
        i = j
      }
    }
    out.iterator
  }

  /** Dictionary longest-match CJK segmenter with bigram fallback for OOV
    * spans — the kuromoji-lite shape (reference: lucene/analysis/kuromoji/
    * src/java/org/apache/lucene/analysis/ja/JapaneseTokenizer.java, mode
    * NORMAL: known dictionary words win; unknown spans fall back to
    * character-level handling; smartcn/nori are the same pattern for
    * zh/ko). Runs are OFFSET-contiguous ideograph singles (a space breaks
    * a run — unlike [[cjkBigrams]]' posIncrement bridging — because a
    * dictionary word never spans a whitespace boundary in the source).
    * Greedy longest match from each position; uncovered chars form OOV
    * spans emitted as overlapping bigrams (a lone char stays a unigram).
    * Positions shift by each run's shrinkage, like [[cjkBigrams]]. */
  def cjkDictSegment(toks: Iterator[Token], dict: Set[String]): Iterator[Token] = {
    val maxLen = if (dict.isEmpty) 0 else dict.iterator.map(w => w.codePointCount(0, w.length)).max
    val arr = toks.toArray
    val out = collection.mutable.ArrayBuffer.empty[Token]
    var shift = 0
    var i = 0
    while (i < arr.length) {
      val t = arr(i)
      if (!isCjkSingle(t.term)) {
        out += t.copy(position = t.position - shift); i += 1
      } else {
        var j = i + 1
        while (j < arr.length && isCjkSingle(arr(j).term) &&
               arr(j).startOffset == arr(j - 1).endOffset) j += 1
        val emitted = collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var oovStart = -1
        def flushOov(endExcl: Int): Unit = if (oovStart >= 0) {
          if (endExcl - oovStart == 1)
            emitted += ((arr(oovStart).term, arr(oovStart).startOffset, arr(oovStart).endOffset))
          else {
            var m = oovStart
            while (m < endExcl - 1) {
              emitted += ((arr(m).term + arr(m + 1).term,
                arr(m).startOffset, arr(m + 1).endOffset))
              m += 1
            }
          }
          oovStart = -1
        }
        var k = i
        while (k < j) {
          var matched = 0
          var len = math.min(maxLen, j - k)
          while (len >= 1 && matched == 0) {
            val sb = new java.lang.StringBuilder
            var q = k
            while (q < k + len) { sb.append(arr(q).term); q += 1 }
            if (dict.contains(sb.toString)) matched = len
            len -= 1
          }
          if (matched > 0) {
            flushOov(k)
            val sb = new java.lang.StringBuilder
            var q = k
            while (q < k + matched) { sb.append(arr(q).term); q += 1 }
            emitted += ((sb.toString, arr(k).startOffset, arr(k + matched - 1).endOffset))
            k += matched
          } else {
            if (oovStart < 0) oovStart = k
            k += 1
          }
        }
        flushOov(j)
        val base = t.position - shift
        var e = 0
        while (e < emitted.length) {
          val (tm, so, eo) = emitted(e)
          out += Token(tm, base + e, so, eo)
          e += 1
        }
        shift += (j - i) - emitted.length
        i = j
      }
    }
    out.iterator
  }

  /** `SynonymGraphFilter` match + `FlattenGraphFilter` renumbering over an
    * already-positioned token stream. At each position, the longest rule
    * whose input terms occupy consecutive positions fires (the FST's
    * longest-match scan). Emission per match, in nondecreasing position
    * order so [[Analyzer.invert]]'s distinct-position length count sees
    * Lucene's `numOverlap` semantics:
    *
    *  - originals (when keepOrig) keep their shifted positions;
    *  - output token k lands at `firstInputPos + k` — the first stacks
    *    (posIncrement 0 ≙ same position), each further one advances one
    *    flattened position;
    *  - when the output is LONGER than the input, every later token shifts
    *    by the difference — the flattened graph inserts positions, which is
    *    exactly how a `mergejoin => merge join` expansion lets the phrase
    *    "merge join" (and a phrase spanning into the next original word)
    *    match the indexed stream.
    */
  def applySynGraph(toks: Iterator[Token], rules: Seq[SynRule]): Iterator[Token] = {
    val arr = toks.toArray
    val byLen = rules.sortBy(-_.input.length)
    val out = collection.mutable.ArrayBuffer.empty[Token]
    var shift = 0
    var i = 0
    while (i < arr.length) {
      val hit = byLen.find { r =>
        r.input.length <= arr.length - i &&
        r.input.indices.forall { k =>
          arr(i + k).term == r.input(k) &&
          (k == 0 || arr(i + k).position == arr(i + k - 1).position + 1)
        }
      }
      hit match {
        case Some(r) =>
          val basePos = arr(i).position + shift
          val endOff = arr(i + r.input.length - 1).endOffset
          val emitted = collection.mutable.ArrayBuffer.empty[Token]
          if (r.keepOrig)
            for (k <- r.input.indices)
              emitted += arr(i + k).copy(position = arr(i + k).position + shift)
          for ((o, k) <- r.output.zipWithIndex)
            emitted += Token(o, basePos + k, arr(i).startOffset, endOff)
          out ++= emitted.sortBy(_.position)
          // flattened positions consumed: with keepOrig both paths coexist
          // (max); a pure replace keeps only the output's span, so a 2->1
          // contraction pulls every later token one position earlier
          val span = if (r.keepOrig) math.max(r.input.length, r.output.length)
                     else r.output.length
          shift += span - r.input.length
          i += r.input.length
        case None =>
          out += arr(i).copy(position = arr(i).position + shift)
          i += 1
      }
    }
    out.iterator
  }

  /** HTMLStripCharFilter subset — see [[Analyzer.htmlStrip]]. Blanks each
    * `<...>` tag span and each recognized character entity with spaces of
    * equal length (the decoded char lands at the entity's first position),
    * so offsets into the original markup survive with no correction pass.
    * An unterminated `<` or an unknown `&name;` passes through unchanged —
    * the tokenizer breaks on both characters anyway. */
  def htmlStripPreserve(text: String): String = {
    var sb: java.lang.StringBuilder = null // allocated lazily on first edit
    @inline def buf(): java.lang.StringBuilder = {
      if (sb == null) sb = new java.lang.StringBuilder(text)
      sb
    }
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < n && text.charAt(j) != '>') j += 1
        if (j < n) { // subset: first '>' closes the tag (no quoted-'>' scan)
          var k = i
          while (k <= j) { buf().setCharAt(k, ' '); k += 1 }
          i = j + 1
        } else i += 1
      } else if (c == '&') {
        var j = i + 1
        while (j < n && j - i <= 9 && text.charAt(j) != ';' &&
               text.charAt(j) != '&' && text.charAt(j) != '<' &&
               !Character.isWhitespace(text.charAt(j))) j += 1
        val dec: Int =
          if (j < n && j > i + 1 && text.charAt(j) == ';') {
            text.substring(i + 1, j) match {
              case "amp"  => '&'
              case "lt"   => '<'
              case "gt"   => '>'
              case "quot" => '"'
              case "apos" => '\''
              case "nbsp" => ' '
              case nm if nm.length > 1 && nm.charAt(0) == '#' =>
                try {
                  val v =
                    if (nm.charAt(1) == 'x' || nm.charAt(1) == 'X')
                      Integer.parseInt(nm.substring(2), 16)
                    else Integer.parseInt(nm.substring(1))
                  if (v >= 0 && v <= 0xFFFF) v else -1 // BMP only (subset)
                } catch { case _: NumberFormatException => -1 }
              case _ => -1
            }
          } else -1
        if (dec >= 0) {
          var k = i
          while (k <= j) { buf().setCharAt(k, ' '); k += 1 }
          buf().setCharAt(i, dec.toChar)
          i = j + 1
        } else i += 1
      } else i += 1
    }
    if (sb == null) text else sb.toString
  }

  /** ASCIIFoldingFilter subset — see [[Analyzer.asciiFold]]. Table-mapped
    * Latin specials first (the reference's explicit fold cases,
    * ASCIIFoldingFilter.java:foldToASCII), then NFD decomposition with
    * combining marks dropped for everything else. ASCII input returns the
    * same instance (zero-copy fast path, like the reference's early-exit
    * scan). Runs after LowerCaseFilter, so the lowercase arms suffice. */
  /** Minimal French stemmer (reference: lucene/analysis/common/src/java/
    * org/apache/lucene/analysis/fr/FrenchMinimalStemmer.java:1-80, from
    * Savoy's published algorithm): words of >= 6 letters lose a final 'x'
    * (with 'aux' -> 'al'), else cascade-drop final s, r, e, é, then reduce
    * a final double letter. */
  def minimalStemFr(t: String): String = {
    if (t.length < 6) return t
    if (t.charAt(t.length - 1) == 'x') {
      return if (t.charAt(t.length - 3) == 'a' && t.charAt(t.length - 2) == 'u')
        t.substring(0, t.length - 2) + "l"
      else t.substring(0, t.length - 1)
    }
    var w = t
    if (w.endsWith("s")) w = w.substring(0, w.length - 1)
    if (w.endsWith("r")) w = w.substring(0, w.length - 1)
    if (w.endsWith("e")) w = w.substring(0, w.length - 1)
    if (w.endsWith("é")) w = w.substring(0, w.length - 1)
    if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2))
      w = w.substring(0, w.length - 1)
    w
  }

  /** NFKC_CF-style fold (see [[Analyzer.icuFold]]): NFKC → codepoint-wise
    * lowercase → accent strip + Latin specials. Idempotent. */
  def foldIcu(s: String): String = {
    var ascii = true
    var k = 0
    while (k < s.length && ascii) { if (s.charAt(k) >= 0x80) ascii = false; k += 1 }
    if (ascii) return foldAscii(s)
    val nfkc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(nfkc.length)
    var i = 0
    while (i < nfkc.length) {
      val cp = nfkc.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    foldAscii(sb.toString)
  }

  def foldAscii(s: String): String = {
    var needs = false
    var k = 0
    while (k < s.length && !needs) {
      if (s.charAt(k) >= 0x80) needs = true
      k += 1
    }
    if (!needs) s
    else {
      val sb = new java.lang.StringBuilder(s.length + 2)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < 0x80) sb.append(c)
        else c match {
          case 'æ'               => sb.append("ae")
          case 'œ'               => sb.append("oe")
          case 'ø'               => sb.append('o')
          case 'ß'               => sb.append("ss")
          case 'þ'               => sb.append("th")
          case 'ð' | 'đ'         => sb.append('d')
          case 'ł'               => sb.append('l')
          case 'ħ'               => sb.append('h')
          case 'ı'               => sb.append('i')
          case 'ŋ'               => sb.append('n')
          case _ =>
            val d = java.text.Normalizer.normalize(
              String.valueOf(c), java.text.Normalizer.Form.NFD)
            var j = 0
            while (j < d.length) {
              val dc = d.charAt(j)
              if (Character.getType(dc) != Character.NON_SPACING_MARK)
                sb.append(dc)
              j += 1
            }
        }
        i += 1
      }
      sb.toString
    }
  }

  /** Harman's S-stemmer, char-for-char the reference's switch — including
    * the intentional `case 'e'` fallthrough to "drop the final s"
    * (reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishMinimalStemmer.java:30-46).
    * Re-expressible in SQL as a CASE over suffixes, which is what the
    * `ft_stem_*` DuckDB oracles do. */
  def minimalStemEn(s: String): String = {
    val len = s.length
    if (len < 3 || s.charAt(len - 1) != 's') s
    else s.charAt(len - 2) match {
      case 'u' | 's' => s
      case 'e' =>
        if (len > 3 && s.charAt(len - 3) == 'i' &&
            s.charAt(len - 4) != 'a' && s.charAt(len - 4) != 'e')
          s.substring(0, len - 3) + "y"
        else if (s.charAt(len - 3) == 'i' || s.charAt(len - 3) == 'a' ||
                 s.charAt(len - 3) == 'o' || s.charAt(len - 3) == 'e') s
        else s.substring(0, len - 1) // the reference's fallthrough arm
      case _ => s.substring(0, len - 1)
    }
  }
}

object Analyzers {
  /** StandardAnalyzer default: EMPTY stop set
    * (reference: lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:50-53). */
  val standard: Analyzer = Analyzer()

  /** The 33-word English stop set of `EnglishAnalyzer.ENGLISH_STOP_WORDS_SET`
    * (reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:43-54). */
  val ENGLISH_STOP_WORDS: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  val english: Analyzer = Analyzer(stopWords = ENGLISH_STOP_WORDS)

  /** SQL-expressible analyzer for DuckDB-oracle-facing queries. */
  val simple: Analyzer = Analyzer(simple = true)

  /** `EnglishMinimalStemFilter` chain over the SQL-expressible tokenizer —
    * the stemming path under the hard oracle (`ft_stem_*`). */
  val minimalStem: Analyzer = Analyzer(simple = true, minimalStem = true)

  /** `LengthFilter` [4, 8] over the SQL-expressible tokenizer — short
    * noise tokens and over-long outliers drop with position gaps. */
  val length48: Analyzer = Analyzer(simple = true, lengthMin = 4, lengthMax = 8)

  /** KeywordRepeat + S-stem + RemoveDuplicates over the SQL-expressible
    * tokenizer: both the surface form and its stem are searchable, the
    * stem stacked at the original's position. */
  val stemKeepOrig: Analyzer =
    Analyzer(simple = true, minimalStem = true, stemKeepOriginal = true)

  /** The reference's full `EnglishAnalyzer` chain (tokenize → lowercase →
    * stop → Porter), over the SQL-expressible tokenizer so the DuckDB
    * oracle can replay it (reference: EnglishAnalyzer.java:106-113; the
    * possessive filter is a no-op on this corpus — the `[a-z0-9]+`
    * tokenizer already splits at apostrophes). Stop filtering precedes
    * stemming, so stop words are dropped by surface form, not stem. */
  val englishPorter: Analyzer =
    Analyzer(simple = true, stopWords = ENGLISH_STOP_WORDS, porterStem = true)

  /** `ShingleFilter` word bigrams (outputUnigrams=false) over the
    * SQL-expressible tokenizer — the shingled index behind
    * `ft_shingle_search`. */
  val shingle2: Analyzer = Analyzer(simple = true, shingleSize = 2)

  /** `WordDelimiterGraphFilter` chain for code identifiers (camelCase /
    * case-transition splitting with the original preserved as a stacked
    * token) — the code-payload analyzer behind `ft_wd_search`/`ft_wd_phrase`. */
  val wordDelim: Analyzer = Analyzer(wordDelimiter = true)

  /** The CJK analysis chain (UAX#29 tokenizer — Han/Hiragana emit as
    * single-codepoint tokens — then `CJKBigramFilter` bigrams), the
    * reference's `CJKAnalyzer` composition
    * (lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/CJKAnalyzer.java:35-60
    * minus its stop set, which is empty for this corpus). */
  val cjk: Analyzer = Analyzer(cjkBigram = true)

  /** Dictionary-first CJK segmentation (kuromoji-lite) with bigram OOV
    * fallback; the demo lexicon covers the injected corpus words. */
  def cjkDict(words: Set[String]): Analyzer = Analyzer(cjkDictWords = words)

  /** WhitespaceTokenizer + DelimitedPayloadTokenFilter('|') — the
    * reference's canonical payload-ingestion pairing. */
  val payload: Analyzer = Analyzer(whitespaceTok = true, payloadDelimiter = '|')

  /** UAX#29 tokenizer + ICU-style NFKC_CF folding chain — the
    * ICUFoldingFilter analyzer for multilingual/width-mixed corpora. */
  val icu: Analyzer = Analyzer(icuFold = true)

  /** UAX#29 tokenizer + lowercase + Snowball German stem — the
    * GermanAnalyzer stem chain (umlauts survive tokenization; the stemmer
    * folds them in its postlude). */
  val german: Analyzer = Analyzer(germanStem = true)

  /** UAX#29 tokenizer + lowercase + minimal French stem — the
    * FrenchMinimalStemFilter chain. */
  val frenchMinimal: Analyzer = Analyzer(frenchMinimalStem = true)

  /** `SynonymGraphFilter` with a MULTI-WORD INPUT rule
    * (`big table => bigtable`, keepOrig): wherever 'big' and 'table' occupy
    * consecutive positions, the single token 'bigtable' stacks at the
    * first word's position (posIncrement 0, flattened) — a term query for
    * 'bigtable' then reads one posting list instead of running a phrase. */
  val synGraphContract: Analyzer = Analyzer(simple = true,
    synRules = Seq(SynRule(Seq("big", "table"), Seq("bigtable"))))

  /** `SynonymGraphFilter` with a MULTI-WORD OUTPUT rule
    * (`mergejoin => merge join`, keepOrig): 'merge' stacks at the source
    * token's position, 'join' lands one flattened position later, and every
    * subsequent token in the doc shifts by one — phrase queries match both
    * inside the expansion and across its trailing boundary. */
  val synGraphExpand: Analyzer = Analyzer(simple = true,
    synRules = Seq(SynRule(Seq("mergejoin"), Seq("merge", "join"))))

  /** Index-time synonym chain (`slow => slow, fast` with keepOrig): 'fast'
    * postings absorb every 'slow' occurrence at its position — the
    * `ft_syn_*` oracle family recomputes tf/df/phrase positions over the
    * merged surface forms. */
  val synonymSlowFast: Analyzer =
    Analyzer(simple = true, synonyms = Map("slow" -> "fast"))

  /** `CommonGramsFilter` over the SQL-expressible tokenizer with the
    * corpus's two stopwords as common words — stopword-adjacent bigrams
    * stack beside the unigrams so a phrase like "the table" executes as one
    * term lookup (`ft_commongrams`). */
  val commonGrams: Analyzer = Analyzer(simple = true, commonWords = Set("a", "the"))

  /** UAX#29 tokenizer + LowerCase + ASCIIFolding — the accent-insensitive
    * chain (Lucene's ASCIIFoldingFilterFactory in a standard chain). The
    * standard tokenizer is required: an accented letter is ALetter (part of
    * its word), which the `[a-z0-9]`-only simple tokenizer would split on. */
  val folding: Analyzer = Analyzer(asciiFold = true)

  /** HTMLStripCharFilter + simple chain — markup removed and entities
    * decoded before tokenization (Solr's HTMLStripCharFilterFactory). */
  val htmlStrip: Analyzer = Analyzer(simple = true, htmlStrip = true)
}
