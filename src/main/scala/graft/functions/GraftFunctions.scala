package graft.functions

import graft.core.{LangDetect, TextClean}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions exposing the pure kernel to SQL / columnar
  * plans — all with `doGenCode` static calls (inside whole-stage codegen,
  * no UDF boxing):
  *
  *  - `qclean(s)`      — the reference sanitizer (TextClean.clean)
  *  - `lang_detect(s)` — the reference keyword language detector
  *  - `sim_ratio(a,b)` — difflib SequenceMatcher.ratio (OCR confidence
  *                       primitive)
  *  - `simhash64(s)`   — SimHash fingerprint (SimHash.scala)
  *
  * These complement the pure-builtin columnar forms in `operators.TextOps`
  * (used for the DuckDB-oracle parity path): the native forms carry the
  * EXACT kernel semantics (incl. astral-char and CJK-branch behavior the
  * regex-chain form approximates only for BMP/ASCII input).
  */
object Kernels {
  def qclean(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(TextClean.clean(s.toString))
  def langDetect(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(LangDetect.detect(s.toString))
  def simRatio(a: UTF8String, b: UTF8String): Double =
    graft.core.DiffLib.ratio(if (a == null) "" else a.toString, if (b == null) "" else b.toString)
}

case class QClean(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = Kernels.qclean(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.qclean($c)")
  override protected def withNewChildInternal(newChild: Expression): QClean = copy(newChild)
  override def prettyName: String = "qclean"
}

case class LangDetectExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = Kernels.langDetect(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.langDetect($c)")
  override protected def withNewChildInternal(newChild: Expression): LangDetectExpr = copy(newChild)
  override def prettyName: String = "lang_detect"
}

case class SimRatio(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.simRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.simRatio($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimRatio = copy(l, r)
  override def prettyName: String = "sim_ratio"
}
