package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native sequential-fold dot product over two `ARRAY<DOUBLE>` columns —
  * `vec_dot(a, b)` — bit-identical to the higher-order composition it
  * replaces, `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, v) -> acc + v)`:
  *  - strictly left-to-right accumulation (the cross-engine exactness
  *    contract [[VectorFunctions.dot]] documents — DuckDB's `list_sum`
  *    folds the same way);
  *  - a NULL element on either side, or a length mismatch, yields NULL
  *    (`zip_with` pads the shorter array with nulls and the fold
  *    null-propagates).
  *
  * Why an Expression and not the HOF composition (SURVEY.md §2.10
  * preference (b) over (a)): Spark's higher-order functions are
  * CodegenFallback — each pair evaluation allocates the zipped array and
  * invokes lambda closures per element, interpreted. The whole vector
  * family (centroid assignment, d5/d11 near-dup scans, s1–s11 serving,
  * d13/m6 admission) is bounded by exactly this fold over
  * rows × centroids pairs, so the tight primitive loop here is the
  * hot-path fix; measured ~3-4× on the k-means training pass. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_dp = graft.functions.DotProduct.compute($a, $b);
         |if (${ev.value}_dp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_dp.doubleValue();
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object DotProduct {
  /** Boxed so NULL (mismatched lengths / null element) has a spelling; the
    * codegen above unboxes straight back into the primitive slot. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native sequential-fold SQUARED L2 distance — `vec_l2sq(a, b)` —
  * bit-identical to `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
  * 0D, (s, t) -> s + t)` (the [[graft.queries.SimilarityQueries]] PQ
  * distance fold): strictly left-to-right accumulation of per-element
  * squared differences; NULL on null element or length mismatch. NOT the
  * algebraic |a|²−2a·b+|b|² expansion — that is a different float
  * expression and would break the oracle's bit-exact replay. */
case class SquaredL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_l2sq requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SquaredL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_l2 = graft.functions.SquaredL2.compute($a, $b);
         |if (${ev.value}_l2 == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_l2.doubleValue();
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_l2sq"
}

object SquaredL2 {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
