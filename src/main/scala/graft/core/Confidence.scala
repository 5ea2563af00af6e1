package graft.core

/** Exact re-implementation of the reference confidence score
  * `calculate_confidence` (reference `main.py:174-185`): mean over all
  * C(N,2) ordered pairs (i < j) of `SequenceMatcher(None, a, b).ratio() * 100`;
  * a single pass scores 100.0. Pair order matters only for fp summation; we
  * sum in the same (i, j) loop order as the reference so the double result is
  * bit-identical for the ≤4-pass inputs the pipeline produces.
  */
object Confidence {

  def pairwise(texts: Seq[String]): Double = {
    if (texts.length == 1) return 100.0            // main.py:176-177
    var sum = 0.0
    var n = 0
    var i = 0
    while (i < texts.length) {
      var j = i + 1
      while (j < texts.length) {
        sum += DiffLib.ratio(texts(i), texts(j)) * 100.0
        n += 1
        j += 1
      }
      i += 1
    }
    if (n > 0) sum / n else 100.0                  // main.py:185
  }
}
