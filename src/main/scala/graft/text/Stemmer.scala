package graft.text

/**
 * Porter stemmer (M.F. Porter, "An algorithm for suffix stripping", 1980;
 * http://snowball.tartarus.org/algorithms/porter/stemmer.html).
 *
 * Capability parity with the reference's stemmer
 * (`/root/reference/src/main/scala-2.11/ch/uzh/sentiment/utils/Stemmer.scala`),
 * including its one deliberate deviation from textbook Porter: in step 1b
 * the reference tests the `(*v*) ED / ING` rules BEFORE the `(m>0) EED->EE`
 * rule (textbook order is the reverse), so `feed -> fe` and `agreed -> agr`
 * (pinned by the reference's StemmerTests). We reproduce that order because
 * the reference's word-score dictionaries and tests are built on it.
 *
 * Implementation is a plain imperative re-write (no rule DSL); it is called
 * per-token inside hot UDFs so it avoids allocation where practical.
 */
object Stemmer {

  def stem(word: String): String = {
    var w = word.toLowerCase
    if (w.length < 1) return w
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  /** True if the char at `pos` is a consonant ('y' after a consonant counts
    * as a vowel). */
  private def isConsonant(w: String, pos: Int): Boolean = {
    if (pos < 0 || pos >= w.length) return false
    w.charAt(pos) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => !isConsonant(w, pos - 1)
      case _ => true
    }
  }

  /** Porter measure m: the number of vowel->consonant transitions. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    while (i < w.length) {
      if (!isConsonant(w, i) && isConsonant(w, i + 1) && i + 1 < w.length) m += 1
      i += 1
    }
    m
  }

  private def containsVowel(w: String): Boolean = {
    var i = 0
    while (i < w.length) { if (!isConsonant(w, i)) return true; i += 1 }
    false
  }

  /** ends with double consonant */
  private def endsCC(w: String): Boolean =
    w.length > 1 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** ends consonant-vowel-consonant, final consonant not w/x/y */
  private def endsCVC(w: String): Boolean =
    w.length > 2 && isConsonant(w, w.length - 1) && !isConsonant(w, w.length - 2) &&
      isConsonant(w, w.length - 3) &&
      !Set('w', 'x', 'y').contains(w.charAt(w.length - 2))

  private def chop(w: String, n: Int): String = w.substring(0, w.length - n)

  // Step 1a: SSES->SS, IES->I, SS->SS, S->""
  private def step1a(w: String): String =
    if (w.endsWith("sses")) chop(w, 4) + "ss"
    else if (w.endsWith("ies")) chop(w, 3) + "i"
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) chop(w, 1)
    else w

  // Step 1b (reference order): (*v*) ED / ING first, else (m>0) EED->EE.
  private def step1b(w: String): String = {
    val vEd = w.endsWith("ed") && containsVowel(chop(w, 2))
    val vIng = w.endsWith("ing") && containsVowel(chop(w, 3))
    if (vEd || vIng) {
      val s = if (vEd) chop(w, 2) else chop(w, 3)
      step1bFixup(s)
    } else if (w.endsWith("eed") && measure(chop(w, 3)) > 0) {
      chop(w, 1)
    } else w
  }

  // After ED/ING removal: AT->ATE, BL->BLE, IZ->IZE, double-consonant (not
  // l/s/z) -> single letter, (m==1 and *o) -> +E. First match wins.
  private def step1bFixup(w: String): String =
    if (w.endsWith("at")) w + "e"
    else if (w.endsWith("bl")) w + "e"
    else if (w.endsWith("iz")) w + "e"
    else if (endsCC(w) && !Set('l', 's', 'z').contains(w.charAt(w.length - 1))) chop(w, 1)
    else if (measure(w) == 1 && endsCVC(w)) w + "e"
    else w

  // Step 1c: (*v*) Y -> I
  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(chop(w, 1))) chop(w, 1) + "i" else w

  private val step2Rules: List[(String, String)] = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Rules: List[(String, String)] = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  // NB: like the reference (and unlike textbook Porter), a rule whose
  // suffix matches but whose m-condition fails does NOT stop the scan —
  // the next rule is still tried.
  private def applyFirst(w: String, rules: List[(String, String)], minM: Int): String = {
    var rs = rules
    while (rs.nonEmpty) {
      val (suf, rep) = rs.head
      if (w.endsWith(suf)) {
        val base = chop(w, suf.length)
        if (measure(base) > minM) return base + rep
      }
      rs = rs.tail
    }
    w
  }

  private def step2(w: String): String = applyFirst(w, step2Rules, 0)
  private def step3(w: String): String = applyFirst(w, step3Rules, 0)

  private val step4Suffixes: List[String] = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  // Step 4: (m>1) strip; "ion" additionally requires the base to end s/t.
  // Same continue-on-condition-failure scan as applyFirst.
  private def step4(w: String): String = {
    var rs = step4Suffixes
    while (rs.nonEmpty) {
      val suf = rs.head
      if (w.endsWith(suf)) {
        val base = chop(w, suf.length)
        val extra = suf != "ion" || base.endsWith("s") || base.endsWith("t")
        if (measure(base) > 1 && extra) return base
      }
      rs = rs.tail
    }
    w
  }

  // Step 5a: (m>1) E -> "", (m==1 and not *o) E -> ""
  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val base = chop(w, 1)
      val m = measure(base)
      if (m > 1 || (m == 1 && !endsCVC(base))) base else w
    } else w

  // Step 5b: (m>1 and *d and *L) -> single letter
  private def step5b(w: String): String =
    if (measure(w) > 1 && endsCC(w) && w.endsWith("ll")) chop(w, 1) else w
}
