package graft.core

/** Exact re-implementation of the reference per-position character vote
  * `get_consensus_text` (reference `main.py:187-205`).
  *
  * For each position i in [0, max(len)): collect the chars of every pass
  * text long enough to have position i (pass order preserved), then take the
  * most common char with **first-seen tie-break** — Python
  * `Counter(chars).most_common(1)` preserves insertion order among equal
  * counts (SURVEY.md §7.5: stable fold, not an order-unstable groupBy).
  *
  * Positions beyond a shorter text simply take votes only from the longer
  * texts; a single pass returns its text unchanged (`main.py:189-190`).
  *
  * Note: operates on UTF-16 chars, matching Python's per-code-point loop for
  * BMP text (all pipeline callers pass raw OCR text which our engines keep
  * in the BMP).
  */
object Consensus {

  def merge(texts: Seq[String]): String = {
    require(texts.nonEmpty, "consensus over zero passes")
    if (texts.length == 1) return texts.head                       // main.py:189-190
    if (texts.length == 2) {
      // TWO-PASS fast path (exact): at every position covered by both
      // texts the vote is either 2-0 (equal chars) or a 1-1 tie — and the
      // first-seen tie-break picks pass 0's char in both cases; positions
      // beyond the shorter text take the longer text's char. So the
      // consensus is pass 0 extended with pass 1's tail. This is the
      // dominant case (level=medium → 2 passes); PropertySpec pins
      // fast == general vote loop.
      val a = texts.head
      val b = texts(1)
      return if (b.length <= a.length) a else a + b.substring(a.length)
    }
    mergeVote(texts)
  }

  /** The general per-position vote loop — the reference semantics for any
    * pass count (kept as the differential-property reference for the
    * two-pass fast path above). */
  private[core] def mergeVote(texts: Seq[String]): String = {
    val maxLen = texts.iterator.map(_.length).max                  // main.py:193
    val sb = new java.lang.StringBuilder(maxLen)
    // scratch hoisted out of the position loop (perf: no per-position alloc)
    val seenChars = new Array[Char](texts.length)
    val seenCounts = new Array[Int](texts.length)
    val arr = texts.toArray
    var i = 0
    while (i < maxLen) {
      // counts in first-seen order over the ≤4 pass chars at position i
      var nSeen = 0
      arr.foreach { t =>
        if (i < t.length) {
          val c = t.charAt(i)
          var k = 0
          var found = false
          while (k < nSeen && !found) {
            if (seenChars(k) == c) { seenCounts(k) += 1; found = true }
            k += 1
          }
          if (!found) { seenChars(nSeen) = c; seenCounts(nSeen) = 1; nSeen += 1 }
        }
      }
      if (nSeen > 0) {                                             // main.py:200-201
        var best = 0
        var k = 1
        while (k < nSeen) {                                        // strict > keeps first-seen on ties,
          if (seenCounts(k) > seenCounts(best)) best = k           // = Counter.most_common(1) semantics
          k += 1
        }
        sb.append(seenChars(best))
      }
      i += 1
    }
    sb.toString
  }
}
