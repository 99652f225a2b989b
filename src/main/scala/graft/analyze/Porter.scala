package graft.analyze

/** Porter stemmer — implemented from the published algorithm (M.F.
  * Porter, "An algorithm for suffix stripping", Program 14(3), 1980),
  * the stemmer OpenSearch exposes as the `porter_stem` token filter.
  *
  * The five steps and their conditions follow the paper exactly
  * (measure `m` over the [C](VC)^m[V] form, `*v*` = contains a vowel,
  * `*d` = double consonant ending, `*o` = cvc ending where the final c
  * is not w/x/y). Input is assumed lowercased (the tokenizer lowers);
  * words shorter than 3 letters are returned unchanged (stemming them
  * is meaningless and the original algorithm skips them).
  *
  * Deterministic, pure, allocation-light — safe inside codegen'd
  * expressions ([[Analyzer]] calls it per token).
  */
object Porter {

  def stem(word: String): String = {
    if (word == null || word.length < 3) return word
    var i = 0
    val n = word.length
    while (i < n) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word // non-alphabetic: leave untouched
      i += 1
    }
    val b = word.toCharArray
    var end = step1a(b, n - 1)
    end = step1b(b, end)
    end = step1c(b, end)
    end = step2(b, end)
    end = step3(b, end)
    end = step4(b, end)
    end = step5(b, end)
    new String(b, 0, end + 1)
  }

  /** Is b(i) a consonant under the paper's rule (y after a consonant is
    * a vowel; y at position 0 is a consonant)? */
  private def cons(b: Array[Char], i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !cons(b, i - 1)
    case _ => true
  }

  /** The measure m of b[0..j]: the number of VC sequences. */
  private def measure(b: Array[Char], j: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonant run
    while (i <= j && cons(b, i)) i += 1
    while (i <= j) {
      // in a vowel run
      while (i <= j && !cons(b, i)) i += 1
      if (i <= j) { // a consonant follows a vowel: one VC
        m += 1
        while (i <= j && cons(b, i)) i += 1
      }
    }
    m
  }

  /** *v* over b[0..j]. */
  private def hasVowel(b: Array[Char], j: Int): Boolean = {
    var i = 0
    while (i <= j) { if (!cons(b, i)) return true; i += 1 }
    false
  }

  /** *d: b[0..j] ends in a double consonant. */
  private def doubleC(b: Array[Char], j: Int): Boolean =
    j >= 1 && b(j) == b(j - 1) && cons(b, j)

  /** *o: b[0..j] ends cvc where the final c is not w, x or y. */
  private def cvc(b: Array[Char], j: Int): Boolean =
    j >= 2 && cons(b, j) && !cons(b, j - 1) && cons(b, j - 2) &&
      b(j) != 'w' && b(j) != 'x' && b(j) != 'y'

  /** Does b[0..end] end with suffix `s`? */
  private def ends(b: Array[Char], end: Int, s: String): Boolean = {
    val l = s.length
    if (l > end + 1) return false
    var i = 0
    while (i < l) {
      if (b(end - l + 1 + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Replace the final `sufLen` chars of b[0..end] with `to`; returns
    * the new end index. */
  private def setTo(b: Array[Char], end: Int, sufLen: Int, to: String): Int = {
    val base = end - sufLen
    var i = 0
    while (i < to.length) { b(base + 1 + i) = to.charAt(i); i += 1 }
    base + to.length
  }

  private def step1a(b: Array[Char], end: Int): Int =
    if (ends(b, end, "sses")) setTo(b, end, 4, "ss")
    else if (ends(b, end, "ies")) setTo(b, end, 3, "i")
    else if (ends(b, end, "ss")) end
    else if (ends(b, end, "s")) end - 1
    else end

  private def step1b(b: Array[Char], end0: Int): Int = {
    var end = end0
    if (ends(b, end, "eed")) {
      if (measure(b, end - 3) > 0) end -= 1
      end
    } else {
      val stripped =
        if (ends(b, end, "ed") && hasVowel(b, end - 2)) { end -= 2; true }
        else if (ends(b, end, "ing") && hasVowel(b, end - 3)) { end -= 3; true }
        else false
      if (stripped) {
        if (ends(b, end, "at")) end = setTo(b, end, 2, "ate")
        else if (ends(b, end, "bl")) end = setTo(b, end, 2, "ble")
        else if (ends(b, end, "iz")) end = setTo(b, end, 2, "ize")
        else if (doubleC(b, end) &&
          b(end) != 'l' && b(end) != 's' && b(end) != 'z') end -= 1
        else if (measure(b, end) == 1 && cvc(b, end)) end = setTo(b, end, 0, "e")
      }
      end
    }
  }

  private def step1c(b: Array[Char], end: Int): Int =
    if (ends(b, end, "y") && hasVowel(b, end - 1)) setTo(b, end, 1, "i")
    else end

  /** (suffix, replacement) pairs applied when m of the stem > 0; longest
    * match by construction (checked in the paper's order, which probes
    * the penultimate letter first — here a linear scan over few rows,
    * words are short). */
  private val s2: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val s3: Array[(String, String)] = Array(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def applyRules(b: Array[Char], end: Int,
                         rules: Array[(String, String)]): Int = {
    var r = 0
    while (r < rules.length) {
      val (suf, to) = rules(r)
      if (ends(b, end, suf)) {
        if (measure(b, end - suf.length) > 0) return setTo(b, end, suf.length, to)
        return end // matched but condition failed: stop (paper semantics)
      }
      r += 1
    }
    end
  }

  private def step2(b: Array[Char], end: Int): Int = applyRules(b, end, s2)
  private def step3(b: Array[Char], end: Int): Int = applyRules(b, end, s3)

  private val s4: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(b: Array[Char], end: Int): Int = {
    var r = 0
    while (r < s4.length) {
      val suf = s4(r)
      if (ends(b, end, suf)) {
        val stemEnd = end - suf.length
        if (measure(b, stemEnd) > 1 &&
          (suf != "ion" || (stemEnd >= 0 && (b(stemEnd) == 's' || b(stemEnd) == 't'))))
          return stemEnd
        return end
      }
      r += 1
    }
    end
  }

  private def step5(b: Array[Char], end0: Int): Int = {
    var end = end0
    // 5a: drop a final e when m > 1, or m = 1 and the stem is not *o
    if (end >= 0 && b(end) == 'e') {
      val m = measure(b, end - 1)
      if (m > 1 || (m == 1 && !cvc(b, end - 1))) end -= 1
    }
    // 5b: m > 1 and *d and *l → single letter
    if (end >= 0 && b(end) == 'l' && doubleC(b, end) && measure(b, end) > 1)
      end -= 1
    end
  }
}
