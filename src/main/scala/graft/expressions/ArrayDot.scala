package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd dot products over primitive arrays — the hot inner loop of
  * every ANN/near-dup query. The round-1 formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` is a
  * correct higher-order-function expression but evaluates two interpreted
  * lambdas per element AND materializes the zipped array; these loops run
  * fused inside whole-stage codegen with zero allocation.
  *
  * Oracle parity: summation is strictly left-to-right in index order —
  * the same order the HOF fold and DuckDB's `list_dot_product` use, so
  * IEEE results are bit-identical to both.
  *
  * Length semantics match `zip_with` (pads the shorter side with null ⇒
  * null products are skipped by the `+` of the fold only when null…): the
  * engine only ever calls these on equal-length vectors; for safety the
  * loop runs over min(len(a), len(b)).
  */
object ArrayDotScan {
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}

/** dot(array<double>, array<double>) -> double. Inputs must not contain
  * nulls (true for all engine-produced vectors).
  */
case class ArrayDotDouble(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two array<double> inputs, got $l, $r")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotScan.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.ArrayDotScan.dotDouble($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotDouble =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot"
}

/** dot(array<long>, array<long>) -> long (exact integer arithmetic). */
case class ArrayDotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_long requires two array<bigint> inputs, got $l, $r")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotScan.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.ArrayDotScan.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_dot_long"
}

object ArrayDotFunctions {
  def arrayDot(a: Column, b: Column): Column =
    CatalystBridge.column(ArrayDotDouble(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
  def arrayDotLong(a: Column, b: Column): Column =
    CatalystBridge.column(ArrayDotLong(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
