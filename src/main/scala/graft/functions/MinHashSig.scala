package graft.functions

import graft.core.Hash64
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numPerms` MinHash signature values of a text's 3-word shingles in
  * ONE native pass — the prod-speed signature path.
  *
  * The oracle-parity path (`Dedup.minhashSignature`) builds shingles with
  * array HOFs and hashes each with md5 so DuckDB can reproduce signatures
  * bit-for-bit; that machinery (per-shingle string concat, per-perm md5,
  * struct fold) dominates its cost — profiling showed the xxhash64 HOF
  * variant ran no faster than md5 because the hash was never the
  * bottleneck. Here the whole signature is a single scan over the string:
  * tokenize in place, roll a 3-word window, one 64-bit base hash per
  * shingle, then `numPerms` cheap seed-mixed finalizations (Hash64.fmix64
  * of base ^ seed — the standard one-hash/many-permutations construction),
  * min-folded on the fly. No intermediate arrays, no boxing.
  *
  * Semantics match `Dedup.minhashSignature`'s shape: normalization =
  * lowercase, whitespace-collapsed words; docs with < 3 words return NULL
  * (dropping them from candidate generation — null never joins); duplicate
  * shingles need no dedup (min is idempotent).
  */
object MinHashKernel {

  private def seed(perm: Int): Long = Hash64(s"mh|$perm")

  def sigs(s: UTF8String, numPerms: Int): ArrayData = {
    if (s == null) return null
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    // word boundaries: runs of whitespace (the HOF form collapses " +" then
    // splits on single space; equivalent token stream)
    val n = str.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && str.charAt(i) != ' ') i += 1
        ends.add(i)
      }
    }
    val words = starts.size()
    if (words < 3) return null
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val seeds = Array.tabulate(numPerms)(seed)
    var w = 0
    while (w + 2 < words) {
      // base hash of "w0 w1 w2" without building the string: FNV over the
      // three word slices with a single space between them
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < 3) {
        if (k > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
        var j = starts.get(w + k)
        val e = ends.get(w + k)
        while (j < e) {
          // FNV-1a over UTF-16 code units of the lowercased text — a
          // deterministic 64-bit base (this is the prod-speed variant; it
          // does not need to match the md5 oracle path bit-for-bit)
          h ^= str.charAt(j).toLong
          h *= 0x100000001b3L
          j += 1
        }
        k += 1
      }
      val base = Hash64.fmix64(h)
      var p = 0
      while (p < numPerms) {
        val hp = Hash64.fmix64(base ^ seeds(p))
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigs(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numPerms >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires STRING and numPerms >= 1, got ${child.dataType} / $numPerms")

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.sigs(v.asInstanceOf[UTF8String], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mhSigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MinHashKernel.sigs($c, $numPerms);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}
