package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native phrase-occurrence counter over token arrays —
  * `phrase_count(toks, ptoks)` — the number of positions `i` at which the
  * consecutive window `toks[i .. i+|ptoks|-1]` equals `ptoks` element-wise.
  * Bit-equal (for null-free token arrays, the only shape the engine feeds
  * it: `split()` output vs a literal phrase) to the higher-order
  * formulation it replaces in s19's positional verify:
  *
  * {{{
  * CAST(CASE WHEN size(toks) >= size(ptoks)
  *   THEN size(filter(sequence(1, size(toks) - size(ptoks) + 1),
  *        i -> toks[i - 1] = ptoks[0]
  *             AND slice(toks, i, size(ptoks)) = ptoks))
  *   ELSE 0 END AS BIGINT)
  * }}}
  *
  * including the first-token short-circuit: positions whose head token
  * differs pay one string equality, never the O(m) window compare. The
  * bit-equality contract is scoped to null-free arrays — the only shape
  * the engine feeds (`split()` output vs a literal phrase); the HOF's own
  * null edges are ANSI-config-dependent (`size(NULL)` = -1 with ANSI off,
  * and `slice(toks, i, -1)` throws), so this expression defines them
  * directly: NULL on either top-level input yields NULL, an empty phrase
  * counts 0, and a NULL element at any compared position makes that
  * position not count.
  *
  * Why an Expression and not the HOF (SURVEY.md §2.10 preference (b) over
  * (a)), same rationale as [[DotProduct]]: Spark's higher-order functions
  * are CodegenFallback — each candidate row allocates the `sequence` array,
  * a `slice` copy per surviving position, and invokes lambda closures per
  * element, interpreted. s19's verify cost is exactly this loop over
  * candidate rows × token positions, the single most expensive serving
  * fold in the bench before this expression. */
case class PhraseCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"phrase_count requires (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(toks: Any, ptoks: Any): Any =
    PhraseCount.compute(toks.asInstanceOf[ArrayData], ptoks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, ptoks) =>
      s"${ev.value} = graft.functions.PhraseCount.compute($toks, $ptoks);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PhraseCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "phrase_count"
}

/** Native MinHash lane-agreement counter — `lane_agree(a, b)` — the number
  * of positions where two signature arrays carry the same lane value,
  * bit-equal to the fold it replaces in the d12/q127 signature
  * verification joins:
  *
  * {{{
  * aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)
  * }}}
  *
  * `zip_with` pads the shorter array with nulls and `IF` sends a NULL
  * comparison to 0, so positions beyond the shorter length or holding a
  * NULL element contribute nothing; a NULL array on either side yields
  * NULL. Same CodegenFallback rationale as [[PhraseCount]]: the HOF
  * allocates the zipped array and runs interpreted lambdas per candidate
  * pair, and this count is the per-pair hot loop of every signature-store
  * admission. */
case class LaneAgree(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lane_agree requires (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LaneAgree.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LaneAgree.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LaneAgree =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "lane_agree"
}

object LaneAgree {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getUTF8String(i).equals(b.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

object PhraseCount {
  def compute(toks: ArrayData, ptoks: ArrayData): Long = {
    val n = toks.numElements()
    val m = ptoks.numElements()
    if (m == 0 || n < m || ptoks.isNullAt(0)) return 0L
    val head: UTF8String = ptoks.getUTF8String(0)
    var count = 0L
    var i = 0
    val lastStart = n - m
    while (i <= lastStart) {
      // the first-token guard: one equality for non-matching heads
      if (!toks.isNullAt(i) && head.equals(toks.getUTF8String(i))) {
        var j = 1
        var ok = true
        while (ok && j < m) {
          ok = !toks.isNullAt(i + j) && !ptoks.isNullAt(j) &&
            ptoks.getUTF8String(j).equals(toks.getUTF8String(i + j))
          j += 1
        }
        if (ok) count += 1
      }
      i += 1
    }
    count
  }
}
