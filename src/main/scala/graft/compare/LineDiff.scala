package graft.compare

import scala.collection.mutable

/** difflib-semantics differ (the Python stdlib's documented
  * Ratcliff–Obershelp matching + `Differ`'s fancy-replace intra-line
  * hints), reimplemented from the published algorithm so
  * [[Reports.diffReportText]] reproduces the reference's export
  * byte-for-byte — the reference diffs with `difflib.Differ()` over
  * `splitlines()` output and `"\n".join`s the result
  * (reference: reports.py:105-138).
  *
  * Fidelity notes:
  *  - `?` hint rows carry their OWN trailing newline (difflib appends one
  *    because its usual inputs keep theirs); joined with "\n" that yields
  *    the blank line after each hint row visible in the reference's real
  *    exports — mirrored here deliberately.
  *  - Character-level matching treats space/tab as junk
  *    (IS_CHARACTER_JUNK) and both levels apply the ≥200-element
  *    "autojunk" popularity purge, matching difflib defaults.
  */
object LineDiff {

  /** SequenceMatcher equivalent over indexed sequences. */
  final class Matcher[T](isJunk: T => Boolean) {
    private var a: IndexedSeq[T] = Vector.empty
    private var b: IndexedSeq[T] = Vector.empty
    private var b2j: mutable.HashMap[T, mutable.ArrayBuffer[Int]] = mutable.HashMap.empty
    private var bjunk: Set[T] = Set.empty

    def setSeqs(aIn: IndexedSeq[T], bIn: IndexedSeq[T]): Unit = { setSeq2(bIn); setSeq1(aIn) }
    def setSeq1(aIn: IndexedSeq[T]): Unit = { a = aIn }

    def setSeq2(bIn: IndexedSeq[T]): Unit = {
      b = bIn
      fullbcount = null
      b2j = mutable.HashMap.empty
      b.zipWithIndex.foreach { case (elt, i) =>
        b2j.getOrElseUpdate(elt, mutable.ArrayBuffer.empty) += i
      }
      val junk = b2j.keysIterator.filter(isJunk).toSet
      junk.foreach(b2j.remove)
      bjunk = junk
      // autojunk: for long sequences, elements occurring in >1% of
      // positions stop SEEDING matches (they still extend them)
      val n = b.length
      if (n >= 200) {
        val ntest = n / 100 + 1
        b2j.filterInPlace { case (_, idxs) => idxs.length <= ntest }
      }
    }

    /** Longest block with a(i..i+k) == b(j..j+k) inside the window;
      * junk never seeds or non-junk-extends, then junk-extends at the
      * edges — the CPython find_longest_match contract. */
    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a(i)).foreach { idxs =>
          var p = 0
          var done = false
          while (p < idxs.length && !done) {
            val j = idxs(p)
            if (j >= blo) {
              if (j >= bhi) done = true
              else {
                val k = j2len.getOrElse(j - 1, 0) + 1
                newj2len(j) = k
                if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
              }
            }
            p += 1
          }
        }
        j2len = newj2len
        i += 1
      }
      def junkAt(j: Int): Boolean = bjunk.contains(b(j))
      while (besti > alo && bestj > blo && !junkAt(bestj - 1) && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             !junkAt(bestj + bestsize) && a(besti + bestsize) == b(bestj + bestsize))
        bestsize += 1
      while (besti > alo && bestj > blo && junkAt(bestj - 1) && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             junkAt(bestj + bestsize) && a(besti + bestsize) == b(bestj + bestsize))
        bestsize += 1
      (besti, bestj, bestsize)
    }

    /** Non-overlapping matching blocks, ascending, merged-adjacent, with
      * the (la, lb, 0) sentinel. */
    def matchingBlocks(): IndexedSeq[(Int, Int, Int)] = {
      val queue = mutable.Stack((0, a.length, 0, b.length))
      val found = mutable.ArrayBuffer.empty[(Int, Int, Int)]
      while (queue.nonEmpty) {
        val (alo, ahi, blo, bhi) = queue.pop()
        val (i, j, k) = findLongestMatch(alo, ahi, blo, bhi)
        if (k > 0) {
          found += ((i, j, k))
          if (alo < i && blo < j) queue.push((alo, i, blo, j))
          if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
        }
      }
      val sorted = found.sortBy(x => (x._1, x._2))
      val merged = mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var (i1, j1, k1) = (0, 0, 0)
      sorted.foreach { case (i2, j2, k2) =>
        if (i1 + k1 == i2 && j1 + k1 == j2) k1 += k2
        else {
          if (k1 > 0) merged += ((i1, j1, k1))
          i1 = i2; j1 = j2; k1 = k2
        }
      }
      if (k1 > 0) merged += ((i1, j1, k1))
      merged += ((a.length, b.length, 0))
      merged.toIndexedSeq
    }

    /** (tag, alo, ahi, blo, bhi) with tag ∈ replace/delete/insert/equal. */
    def opcodes(): IndexedSeq[(String, Int, Int, Int, Int)] = {
      var i = 0; var j = 0
      val out = mutable.ArrayBuffer.empty[(String, Int, Int, Int, Int)]
      matchingBlocks().foreach { case (ai, bj, size) =>
        val tag =
          if (i < ai && j < bj) "replace"
          else if (i < ai) "delete"
          else if (j < bj) "insert"
          else ""
        if (tag.nonEmpty) out += ((tag, i, ai, j, bj))
        i = ai + size; j = bj + size
        if (size > 0) out += (("equal", ai, i, bj, j))
      }
      out.toIndexedSeq
    }

    def ratio(): Double = {
      val matches = matchingBlocks().map(_._3).sum
      val t = a.length + b.length
      if (t == 0) 1.0 else 2.0 * matches / t
    }

    private var fullbcount: mutable.HashMap[T, Int] = null

    /** difflib's quick_ratio: multiset-intersection upper bound of
      * [[ratio]] — O(|a|+|b|), no matching-block computation. */
    def quickRatio(): Double = {
      if (fullbcount == null) {
        fullbcount = mutable.HashMap.empty
        b.foreach(elt => fullbcount(elt) = fullbcount.getOrElse(elt, 0) + 1)
      }
      val avail = mutable.HashMap.empty[T, Int]
      var matches = 0
      a.foreach { elt =>
        val numb = avail.getOrElse(elt, fullbcount.getOrElse(elt, 0))
        avail(elt) = numb - 1
        if (numb > 0) matches += 1
      }
      val t = a.length + b.length
      if (t == 0) 1.0 else 2.0 * matches / t
    }

    /** difflib's real_quick_ratio: length-only upper bound, O(1). */
    def realQuickRatio(): Double = {
      val t = a.length + b.length
      if (t == 0) 1.0 else 2.0 * math.min(a.length, b.length) / t
    }
  }

  private def charJunk(c: Char): Boolean = c == ' ' || c == '\t'

  private def chars(s: String): IndexedSeq[Char] = s: collection.immutable.WrappedString

  /** Differ.compare over pre-split lines (no trailing newlines — the
    * reference feeds splitlines() output). */
  def compare(a: IndexedSeq[String], b: IndexedSeq[String]): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val lineMatcher = new Matcher[String](_ => false)
    lineMatcher.setSeqs(a, b)
    lineMatcher.opcodes().foreach {
      case ("replace", alo, ahi, blo, bhi) => fancyReplace(out, a, alo, ahi, b, blo, bhi)
      case ("delete", alo, ahi, _, _)      => dump(out, "-", a, alo, ahi)
      case ("insert", _, _, blo, bhi)      => dump(out, "+", b, blo, bhi)
      case ("equal", alo, ahi, _, _)       => dump(out, " ", a, alo, ahi)
      case _ => ()
    }
    out.toSeq
  }

  private def dump(out: mutable.ArrayBuffer[String], tag: String,
                   xs: IndexedSeq[String], lo: Int, hi: Int): Unit = {
    var i = lo
    while (i < hi) { out += s"$tag ${xs(i)}"; i += 1 }
  }

  private def plainReplace(out: mutable.ArrayBuffer[String],
                           a: IndexedSeq[String], alo: Int, ahi: Int,
                           b: IndexedSeq[String], blo: Int, bhi: Int): Unit =
    if (bhi - blo < ahi - alo) { // dump the shorter block first
      dump(out, "+", b, blo, bhi); dump(out, "-", a, alo, ahi)
    } else {
      dump(out, "-", a, alo, ahi); dump(out, "+", b, blo, bhi)
    }

  /** Differ._fancy_replace: pair up the most similar line across the
    * replace block (ratio > 0.74 cutoff), recurse around the synch pair,
    * and emit `?` intra-line hint rows for the paired lines. */
  private def fancyReplace(out: mutable.ArrayBuffer[String],
                           a: IndexedSeq[String], alo: Int, ahi: Int,
                           b: IndexedSeq[String], blo: Int, bhi: Int): Unit = {
    var bestRatio = 0.74
    val cutoff = 0.75
    val cruncher = new Matcher[Char](charJunk)
    var eqi = -1; var eqj = -1
    var bestI = -1; var bestJ = -1
    var j = blo
    while (j < bhi) {
      cruncher.setSeq2(chars(b(j)))
      var i = alo
      while (i < ahi) {
        if (a(i) == b(j)) {
          if (eqi < 0) { eqi = i; eqj = j }
        } else {
          cruncher.setSeq1(chars(a(i)))
          // difflib's two upper-bound gates before the expensive ratio():
          // they select identically (upper bounds can only skip pairs that
          // cannot win) and keep large pretty-printed-body replace blocks
          // from running n·m full Ratcliff–Obershelp matches
          if (cruncher.realQuickRatio() > bestRatio &&
              cruncher.quickRatio() > bestRatio) {
            val r = cruncher.ratio()
            if (r > bestRatio) { bestRatio = r; bestI = i; bestJ = j }
          }
        }
        i += 1
      }
      j += 1
    }
    var synchedOnEqual = false
    if (bestRatio < cutoff) {
      if (eqi < 0) { plainReplace(out, a, alo, ahi, b, blo, bhi); return }
      bestI = eqi; bestJ = eqj
      synchedOnEqual = true
    }
    fancyHelper(out, a, alo, bestI, b, blo, bestJ)
    val aelt = a(bestI); val belt = b(bestJ)
    if (!synchedOnEqual) {
      val atags = new StringBuilder; val btags = new StringBuilder
      cruncher.setSeqs(chars(aelt), chars(belt))
      cruncher.opcodes().foreach { case (tag, ai1, ai2, bj1, bj2) =>
        val la = ai2 - ai1; val lb = bj2 - bj1
        tag match {
          case "replace" => atags.append("^" * la); btags.append("^" * lb)
          case "delete"  => atags.append("-" * la)
          case "insert"  => btags.append("+" * lb)
          case _         => atags.append(" " * la); btags.append(" " * lb)
        }
      }
      qformat(out, aelt, belt, atags.toString, btags.toString)
    } else out += s"  $aelt"
    fancyHelper(out, a, bestI + 1, ahi, b, bestJ + 1, bhi)
  }

  private def fancyHelper(out: mutable.ArrayBuffer[String],
                          a: IndexedSeq[String], alo: Int, ahi: Int,
                          b: IndexedSeq[String], blo: Int, bhi: Int): Unit =
    if (alo < ahi) {
      if (blo < bhi) fancyReplace(out, a, alo, ahi, b, blo, bhi)
      else dump(out, "-", a, alo, ahi)
    } else if (blo < bhi) dump(out, "+", b, blo, bhi)

  /** Differ._qformat: emit the paired lines with `?` hint rows; original
    * whitespace is kept where the tag is a blank (so hints stay aligned
    * under tabs), and hint rows carry their own trailing newline. */
  private def qformat(out: mutable.ArrayBuffer[String], aline: String,
                      bline: String, atags: String, btags: String): Unit = {
    def keepWs(line: String, tags: String): String =
      line.zip(tags).map { case (c, t) => if (t == ' ' && c.isWhitespace) c else t }
        .mkString.replaceAll("\\s+$", "")
    val at = keepWs(aline, atags)
    val bt = keepWs(bline, btags)
    out += s"- $aline"
    if (at.nonEmpty) out += s"? $at\n"
    out += s"+ $bline"
    if (bt.nonEmpty) out += s"? $bt\n"
  }
}
