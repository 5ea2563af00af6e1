package graft.core

/** Deterministic 64-bit string hash (FNV-1a over UTF-8 bytes, plus an
  * avalanche finalizer from the public MurmurHash3 finalizer constants).
  * Drives ALL fixture/media synthesis (FIXTURES.md: "hash-driven, no RNG
  * state, no wall clock") so any scale regenerates bit-identically and both
  * bench parallelism levels read identical data.
  */
object Hash64 {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime  = 0x100000001b3L

  def apply(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    fmix64(h)
  }

  /** MurmurHash3 fmix64 finalizer (public domain constants). */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= (h >>> 33)
    h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33)
    h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }

  /** Non-negative modulus pick in [0, n). */
  def pick(s: String, n: Int): Int = {
    val h = apply(s)
    (((h % n) + n) % n).toInt
  }

  // --- incremental form (round-6 perf): fold a shared key PREFIX once and
  // extend per suffix — bit-identical to apply(prefix + suffix) for ASCII
  // keys because FNV-1a is a sequential byte fold with the finalizer
  // applied only at the end (PropertySpec-style pin in KernelSpec).

  /** FNV-1a state after folding the UTF-8 bytes of `s` (NO finalizer). */
  def prefixState(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Extend a prefix state with the decimal digits of `i` (>= 0), finalize,
    * and pick in [0, n) — equals `pick(prefix + i.toString, n)`. */
  def pickFrom(state: Long, i: Int, n: Int): Int = {
    // checked, not just documented: a negative i would fold garbage chars
    // (no '-' sign) and silently diverge from pick(prefix + i.toString, n)
    require(i >= 0, s"pickFrom requires i >= 0, got $i")
    var h = state
    // fold the decimal digits of i most-significant first, as toString would
    var div = 1
    while (i / div >= 10) div *= 10
    var rest = i
    while (div > 0) {
      val d = rest / div
      h ^= ('0' + d).toLong
      h *= FnvPrime
      rest -= d * div
      div /= 10
    }
    (((fmix64(h) % n) + n) % n).toInt
  }
}
