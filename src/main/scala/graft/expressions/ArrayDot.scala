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
  * Length semantics DIFFER from the replaced HOF on unequal-length
  * inputs: `zip_with` null-pads the shorter side, which poisons the fold
  * to null, while this loop silently returns the min-length dot product.
  * The engine only ever calls these on equal-length vectors (one
  * embedding column), where the two agree exactly.
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

/** IVF coarse-quantizer cell assignment: argmax over a (broadcast,
  * column-bound) centroid table of cosine scores against one quantized
  * vector — `argmax_c dot(qe, ce) / (nrm · cnrm)`, ties to the smaller
  * cid (the oracle's ORDER BY score DESC, cid).
  *
  * Why an expression and not an aggregate: a per-vector `groupBy(vid)
  * .max_by(...)` argmax materializes n×nCentroids rows into an
  * object-hash aggregate with array-typed buffers (measured ~1 s per
  * Lloyd iteration at bench scale); this computes the cell in the scan
  * projection, so the only aggregate left is nCentroids groups wide. The
  * centroids arrive as a COLUMN (one-row broadcast), not literals — the
  * generated class is identical across Lloyd iterations, so codegen
  * compiles once per query rather than once per iteration.
  */
object IvfAssignScan {
  def assign(qe: ArrayData, nrm: Double, cents: ArrayData): Long = {
    val n = cents.numElements()
    var bestScore = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var i = 0
    while (i < n) {
      val c = cents.getStruct(i, 3)
      val cid = c.getLong(0)
      val score = ArrayDotScan.dotLong(qe, c.getArray(1)).toDouble / (nrm * c.getDouble(2))
      // Double.compare, not >: a zero-norm vector or centroid yields NaN
      // scores, which BOTH Spark's ordering (max_by) and DuckDB's ORDER BY
      // treat as greater than every number — the plain > would silently
      // skip them and return a nonexistent cell.
      val cmp = java.lang.Double.compare(score, bestScore)
      if (cmp > 0 || (cmp == 0 && cid < bestCid)) {
        bestScore = score
        bestCid = cid
      }
      i += 1
    }
    bestCid
  }

  /** Double-vector variant (the untrained quantizer of ivfTopK /
    * ivfBatchTopK works on raw double embeddings): same argmax and the
    * same Double.compare NaN/tie discipline as `assign` — which is also
    * exactly the lexicographic (score, −cid) ordering the replaced
    * `max_by(cid, struct(score, -cid))` aggregate used (Spark's double
    * ordering is java.lang.Double.compare: NaN greatest).
    */
  def assignD(qe: ArrayData, nrm: Double, cents: ArrayData): Long = {
    val n = cents.numElements()
    var bestScore = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var i = 0
    while (i < n) {
      val c = cents.getStruct(i, 3)
      val cid = c.getLong(0)
      val score = ArrayDotScan.dotDouble(qe, c.getArray(1)) / (nrm * c.getDouble(2))
      val cmp = java.lang.Double.compare(score, bestScore)
      if (cmp > 0 || (cmp == 0 && cid < bestCid)) {
        bestScore = score
        bestCid = cid
      }
      i += 1
    }
    bestCid
  }
}

/** ivf_assign_cell(array<T> qe, double nrm,
  * array<struct<cid:long, ce:array<T>, cnrm:double>> cents) -> long,
  * with T = bigint (quantized k-means path) or double (untrained
  * quantizer path); dispatch is resolved at plan time from the input
  * type, so each variant codegens a direct static call.
  */
case class IvfAssignCell(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  private lazy val isDoubleVec: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(et, _), DoubleType,
            ArrayType(org.apache.spark.sql.types.StructType(fields), _))
          if (et == LongType || et == DoubleType) &&
            fields.length == 3 && fields(0).dataType == LongType &&
            (fields(1).dataType match {
              case ArrayType(ce, _) => ce == et
              case _ => false
            }) && fields(2).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"ivf_assign_cell requires (array<T>, double, array<struct<bigint, array<T>, double>>) with T in {bigint, double}, got $a, $b, $c")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(qe: Any, nrm: Any, cents: Any): Any =
    // direct static dispatch — no per-call closure (interpreted eval
    // sits in the Lloyd-iteration hot path when codegen falls back)
    if (isDoubleVec)
      IvfAssignScan.assignD(
        qe.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
        cents.asInstanceOf[ArrayData])
    else
      IvfAssignScan.assign(
        qe.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
        cents.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isDoubleVec) "assignD" else "assign"
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.expressions.IvfAssignScan.$m($a, $b, $c)")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): IvfAssignCell =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ivf_assign_cell"
}

object ArrayDotFunctions {
  def arrayDot(a: Column, b: Column): Column =
    CatalystBridge.column(ArrayDotDouble(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
  def arrayDotLong(a: Column, b: Column): Column =
    CatalystBridge.column(ArrayDotLong(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
  def ivfAssignCell(qe: Column, nrm: Column, cents: Column): Column =
    CatalystBridge.column(IvfAssignCell(
      CatalystBridge.expression(qe), CatalystBridge.expression(nrm),
      CatalystBridge.expression(cents)))
}
