package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition counts in ONE fused native pass — value-identical
  * to the builtin construction in `TextOps.repetitionCols` (pinned by
  * Md5ParitySpec): [n_words, sum_word_chars, top_word_n, top_bigram_n] over
  * the dedup pipeline's normalized word list. The builtin form's
  * `aggregate(array_sort(...), struct, ...)` fold is CodegenFallback —
  * every word/bigram walks an interpreted expression tree and boxes a
  * 3-field struct; here the most-frequent-element counts come from one
  * hash-map pass (count of the most frequent element ≡ longest equal run
  * of the sorted array, the builtin's formulation).
  *
  * Exactness: words = split(regexp_replace(lower(trim(s)), " +", " "), " ")
  * (so empty input yields the single empty word, n_words = 1, top_word_n =
  * 1); word length counts Unicode code points like `length()`; bigrams =
  * the n−1 adjacent pairs joined by one space (0 for n = 1). Null for null
  * input — each extracted field is then null, as the builtin columns were. */
object TextStatsKernel {
  def repetitionCounts(s: UTF8String): ArrayData = {
    val words = Md5TextKernel.normWords(s)
    val n = words.length
    var sumChars = 0L
    val wordCounts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val w = words(i)
      sumChars += w.codePointCount(0, w.length)
      wordCounts.merge(w, 1L, (a, b) => a + b)
      i += 1
    }
    var topWord = 0L
    val wit = wordCounts.values().iterator()
    while (wit.hasNext) { val c = wit.next(); if (c > topWord) topWord = c }
    var topBigram = 0L
    if (n >= 2) {
      val bigramCounts = new java.util.HashMap[String, Long]()
      val sb = new java.lang.StringBuilder()
      i = 0
      while (i + 1 < n) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1))
        bigramCounts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      val bit = bigramCounts.values().iterator()
      while (bit.hasNext) { val c = bit.next(); if (c > topBigram) topBigram = c }
    }
    new GenericArrayData(Array[Any](n.toLong, sumChars, topWord, topBigram))
  }
}

case class RepetitionCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_counts requires STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextStatsKernel.repetitionCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.repetitionCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)

  override def prettyName: String = "repetition_counts"
}

object TextStats {
  /** [n_words, sum_word_chars, top_word_n, top_bigram_n] as array<long>. */
  def repetitionCounts(c: Column): Column =
    bridge.column(RepetitionCounts(bridge.expression(c)))
}
