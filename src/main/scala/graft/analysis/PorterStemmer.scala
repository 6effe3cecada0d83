package graft.analysis

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — the stemmer behind the reference's
  * default English analysis chain
  * (reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java:1-541,
  * wired by EnglishAnalyzer.java:43-54 as StandardTokenizer → possessive →
  * lowercase → stop → PorterStemFilter).
  *
  * Implemented from the published specification, plus the two
  * author-sanctioned departures the reference (and Snowball's `porter`
  * definition) both ship: step 2 maps `bli→ble` (the paper had `abli→able`)
  * and adds `logi→log`.
  *
  * Words of length ≤ 2 are returned unchanged (the reference's `k <= 1`
  * early-out, PorterStemmer.java stem()). All conditions (`m`, `*v*`, `*d`,
  * `*o`) are evaluated on the stem left after removing the candidate
  * suffix, exactly as the paper defines them:
  *  - a letter is a consonant iff it is not a,e,i,o,u and not a `y`
  *    preceded by a consonant (so "toy" = CVC, "syzygy" = CVCVCV);
  *  - `m` counts VC sequences in the [C](VC)^m[V] decomposition;
  *  - `*o` = stem ends consonant-vowel-consonant where the final consonant
  *    is not w, x or y.
  */
object PorterStemmer {

  def stem(s: String): String = {
    if (s.length <= 2) return s
    val st = new State(s.toCharArray, s.length - 1)
    st.step1ab()
    st.step1c()
    st.step2()
    st.step3()
    st.step4()
    st.step5()
    new String(st.b, 0, st.k + 1)
  }

  /** Mutable word buffer: `k` = index of last letter, `j` = end of the stem
    * that remains when the suffix most recently matched by `ends` is
    * removed. */
  private final class State(val b: Array[Char], var k: Int) {
    var j: Int = 0

    /** True iff b(i) is a consonant under the paper's definition. */
    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** The measure m of b[0..j]: VC-sequence count of the stem. */
    private def m(): Int = {
      var n = 0
      var i = 0
      // skip the optional leading consonant run [C]
      while (i <= j && cons(i)) i += 1
      while (i <= j) {
        // inside a vowel run
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && cons(i)) i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    /** b[i-1] == b[i] and both consonants. */
    private def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, final consonant not w/x/y. */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) false
      else b(i) != 'w' && b(i) != 'x' && b(i) != 'y'
    }

    /** Does b[0..k] end with `suf`? Sets j to the stem end on match. */
    private def ends(suf: String): Boolean = {
      val l = suf.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != suf.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** Replace the matched suffix (b[j+1..k]) with `s`. */
    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    /** setTo(s) guarded by m > 0 (the paper's step-2/3 condition). */
    private def r(s: String): Unit = if (m() > 0) setTo(s)

    // Step 1a: SSES→SS, IES→I, SS→SS, S→ε
    // Step 1b: (m>0) EED→EE; (*v*) ED→ε / ING→ε then the AT/BL/IZ,
    //          un-double, add-E cleanup
    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doublec(k)) {
          if (b(k) != 'l' && b(k) != 's' && b(k) != 'z') k -= 1
        } else {
          j = k
          if (m() == 1 && cvc(k)) setTo("e")
        }
      }
    }

    // Step 1c: (*v*) Y→I
    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    // Step 2 (m>0), dispatched on the penultimate letter like the reference
    def step2(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // departure: paper had abli→able
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // departure: not in the 1980 paper
        case _ =>
      }
    }

    // Step 3 (m>0)
    def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    // Step 4 (m>1): strip the residual suffix
    def step4(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' =>
          (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    // Step 5a: (m>1) E→ε; (m=1 and not *o) E→ε.  Step 5b: (m>1, *d, *L) → single L
    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      j = k
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }
  }
}
