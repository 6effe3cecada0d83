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
final case class Token(term: String, position: Int, startOffset: Int, endOffset: Int)

/** Raw token before filters: carries the position increment. */
final case class RawToken(term: String, posIncr: Int, startOffset: Int, endOffset: Int)

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

  private def classify(cp: Int): Int = {
    if (cp == '_' || Character.getType(cp) == Character.CONNECTOR_PUNCTUATION) ExtendNumLet
    else if (Character.isDigit(cp)) Numeric
    else if (Character.isLetter(cp)) {
      val script = Character.UnicodeScript.of(cp)
      if (script == Character.UnicodeScript.HAN || script == Character.UnicodeScript.HIRAGANA) Ideographic
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
    synonyms: Map[String, String] = Map.empty) extends Serializable {

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
    val raw =
      if (wordDelimiter) caseTokens(text).flatMap(wdExpand)
      else if (simple) simpleTokens(lowercase(text))
      else Tokenizer.tokenize(text, maxTokenLength)
    var pos = -1
    var pendingGap = 0 // posIncrements accumulated from stop-filtered tokens
    val base = raw.flatMap { rt =>
      val term = lowercase(rt.term)
      if (stopWords.contains(term)) {
        pendingGap += rt.posIncr
        Iterator.empty
      } else {
        pos += rt.posIncr + pendingGap
        pendingGap = 0
        val out = if (minimalStem) Analyzer.minimalStemEn(term) else term
        val tok = Token(out, pos, rt.startOffset, rt.endOffset)
        synonyms.get(out) match {
          case Some(syn) =>
            Iterator(tok, Token(syn, pos, rt.startOffset, rt.endOffset))
          case None => Iterator.single(tok)
        }
      }
    }
    if (shingleSize <= 1) base
    else base.sliding(shingleSize).withPartial(false).map { w =>
      Token(w.iterator.map(_.term).mkString("_"),
        w.head.position, w.head.startOffset, w.last.endOffset)
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

  /** `ShingleFilter` word bigrams (outputUnigrams=false) over the
    * SQL-expressible tokenizer — the shingled index behind
    * `ft_shingle_search`. */
  val shingle2: Analyzer = Analyzer(simple = true, shingleSize = 2)

  /** `WordDelimiterGraphFilter` chain for code identifiers (camelCase /
    * case-transition splitting with the original preserved as a stacked
    * token) — the code-payload analyzer behind `ft_wd_search`/`ft_wd_phrase`. */
  val wordDelim: Analyzer = Analyzer(wordDelimiter = true)

  /** Index-time synonym chain (`slow => slow, fast` with keepOrig): 'fast'
    * postings absorb every 'slow' occurrence at its position — the
    * `ft_syn_*` oracle family recomputes tf/df/phrase positions over the
    * merged surface forms. */
  val synonymSlowFast: Analyzer =
    Analyzer(simple = true, synonyms = Map("slow" -> "fast"))
}
