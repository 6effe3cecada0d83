package graft.analysis

/** Snowball German stemmer, implemented from the PUBLISHED algorithm
  * description (snowballstem.org/algorithms/german/stemmer.html) — the
  * algorithm the reference wires as `GermanAnalyzer`'s stem step /
  * `SnowballFilter("German")` (reference: lucene/analysis/common/src/java/
  * org/apache/lucene/analysis/de/GermanAnalyzer.java:43-70,
  * snowball/SnowballFilter.java:1-120). Spec-derived like [[PorterStemmer]],
  * NOT a translation of the generated Java SnowballProgram.
  *
  * Shape: prelude (ß→ss, u/y between vowels marked as consonants) →
  * R1/R2 regions (R1 floored at 3 letters) → three suffix-stripping steps
  * (flexion endings, verb/adjective endings, derivational d-suffixes) →
  * postlude (unmark, fold umlauts).
  */
object GermanStemmer {

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
      c == 'ä' || c == 'ö' || c == 'ü'

  /** b d f g h k l m n r t */
  @inline private def validSEnding(c: Char): Boolean =
    c == 'b' || c == 'd' || c == 'f' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'l' || c == 'm' || c == 'n' || c == 'r' || c == 't'

  /** b d f g h k l m n t (valid s-endings minus r) */
  @inline private def validStEnding(c: Char): Boolean =
    c == 'b' || c == 'd' || c == 'f' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'l' || c == 'm' || c == 'n' || c == 't'

  /** Start of the region after the first non-vowel following a vowel,
    * scanning from `from`; s.length if there is none. Marked U/Y are
    * uppercase and therefore non-vowels here, as the spec intends. */
  private def regionStart(s: String, from: Int): Int = {
    var i = from
    while (i < s.length - 1) {
      if (isVowel(s.charAt(i)) && !isVowel(s.charAt(i + 1))) return i + 2
      i += 1
    }
    s.length
  }

  def stem(word: String): String = {
    if (word.length < 2) return word
    // prelude: ß -> ss; u and y BETWEEN vowels are consonants (marked by
    // uppercasing, undone in the postlude)
    val pre = word.replace("ß", "ss")
    val marked = {
      val sb = new java.lang.StringBuilder(pre.length)
      var i = 0
      while (i < pre.length) {
        val c = pre.charAt(i)
        if ((c == 'u' || c == 'y') && i > 0 && i < pre.length - 1 &&
            isVowel(pre.charAt(i - 1)) && isVowel(pre.charAt(i + 1)))
          sb.append(Character.toUpperCase(c))
        else sb.append(c)
        i += 1
      }
      sb.toString
    }
    // standard R1/R2, then R1 floored so >= 3 letters precede it
    val r1std = regionStart(marked, 0)
    val r2 = regionStart(marked, r1std)
    val r1 = math.max(r1std, 3)

    var w = marked
    @inline def inR1(suffixStart: Int) = suffixStart >= r1
    @inline def inR2(suffixStart: Int) = suffixStart >= r2

    // ---- step 1: longest of {ern, em, er, en, es, e, s}; gate, delete ----
    if (w.endsWith("ern")) { if (inR1(w.length - 3)) w = w.dropRight(3) }
    else if (w.endsWith("em")) { if (inR1(w.length - 2)) w = w.dropRight(2) }
    else if (w.endsWith("er")) { if (inR1(w.length - 2)) w = w.dropRight(2) }
    else if (w.endsWith("en")) { if (inR1(w.length - 2)) { w = w.dropRight(2); if (w.endsWith("niss")) w = w.dropRight(1) } }
    else if (w.endsWith("es")) { if (inR1(w.length - 2)) { w = w.dropRight(2); if (w.endsWith("niss")) w = w.dropRight(1) } }
    else if (w.endsWith("e")) { if (inR1(w.length - 1)) { w = w.dropRight(1); if (w.endsWith("niss")) w = w.dropRight(1) } }
    else if (w.endsWith("s")) {
      if (inR1(w.length - 1) && w.length >= 2 && validSEnding(w.charAt(w.length - 2)))
        w = w.dropRight(1)
    }

    // ---- step 2: longest of {est, en, er, st} ----
    if (w.endsWith("est")) { if (inR1(w.length - 3)) w = w.dropRight(3) }
    else if (w.endsWith("en")) { if (inR1(w.length - 2)) w = w.dropRight(2) }
    else if (w.endsWith("er")) { if (inR1(w.length - 2)) w = w.dropRight(2) }
    else if (w.endsWith("st")) {
      // valid st-ending, itself preceded by at least 3 letters
      if (inR1(w.length - 2) && w.length >= 6 && validStEnding(w.charAt(w.length - 3)))
        w = w.dropRight(2)
    }

    // ---- step 3: d-suffixes, longest of {isch, lich, heit, keit, end, ung, ig, ik} ----
    if (w.endsWith("isch")) {
      if (inR2(w.length - 4) && (w.length < 5 || w.charAt(w.length - 5) != 'e'))
        w = w.dropRight(4)
    } else if (w.endsWith("lich") || w.endsWith("heit")) {
      if (inR2(w.length - 4)) {
        w = w.dropRight(4)
        // try: preceding er/en in R1 also deleted
        if ((w.endsWith("er") || w.endsWith("en")) && inR1(w.length - 2))
          w = w.dropRight(2)
      }
    } else if (w.endsWith("keit")) {
      if (inR2(w.length - 4)) {
        w = w.dropRight(4)
        if (w.endsWith("lich") && inR2(w.length - 4)) w = w.dropRight(4)
        else if (w.endsWith("ig") && inR2(w.length - 2)) w = w.dropRight(2)
      }
    } else if (w.endsWith("end") || w.endsWith("ung")) {
      if (inR2(w.length - 3)) {
        w = w.dropRight(3)
        // try: preceding ig in R2 (not itself preceded by e) also deleted
        if (w.endsWith("ig") && inR2(w.length - 2) &&
            (w.length < 3 || w.charAt(w.length - 3) != 'e'))
          w = w.dropRight(2)
      }
    } else if (w.endsWith("ig") || w.endsWith("ik")) {
      if (inR2(w.length - 2) && (w.length < 3 || w.charAt(w.length - 3) != 'e'))
        w = w.dropRight(2)
    }

    // ---- postlude: unmark U/Y, fold umlauts ----
    val out = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      w.charAt(i) match {
        case 'U' => out.append('u')
        case 'Y' => out.append('y')
        case 'ä' => out.append('a')
        case 'ö' => out.append('o')
        case 'ü' => out.append('u')
        case c => out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
