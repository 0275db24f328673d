package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Element-wise exact-integer vector sum — `vec_sum_u6(v)` aggregates
  * `ARRAY<DOUBLE>` rows into `ARRAY<BIGINT>` of `Σ round(v[i]·10⁶)` per
  * dimension, the k-means centroid-update sum ([[graft.queries
  * .SimilarityQueries]] `centUpdate`). Replaces the posexplode →
  * groupBy(c_id, i) → collect_list/sort re-assembly: the exploded stream
  * shuffles dim × N slim rows through TWO aggregations, while this buffer
  * partial-aggregates map-side to ONE dim-slot row per group and needs a
  * single shuffle — at 10⁸ vectors × 64 dims that is 6.4e9 exploded rows
  * that never exist.
  *
  * Exactness contract (oracle-replayable): each element contributes
  * through Spark's own `round(x · 1e6)` decimal HALF_UP semantics
  * (BigDecimal.valueOf — the identical code path the SQL expression
  * takes), summed as BIGINT — order-invariant, so the map-side combine
  * cannot perturb the result. NULL vectors contribute nothing; a NULL
  * element contributes nothing to its dimension; rows shorter than the
  * longest row simply stop contributing past their length (exactly the
  * semantics of posexplode + SUM-ignores-NULL). */
case class VecSumU6(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumU6.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum_u6 requires ARRAY<DOUBLE>, got ${other.sql}")
    }

  override def createAggregationBuffer(): VecSumU6.Buf = new VecSumU6.Buf(Array.emptyLongArray)

  override def update(buf: VecSumU6.Buf, input: InternalRow): VecSumU6.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf.sums(i) += VecSumU6.roundU6(arr.getDouble(i))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VecSumU6.Buf, other: VecSumU6.Buf): VecSumU6.Buf = {
    val n = other.sums.length
    buf.grow(n)
    var i = 0
    while (i < n) { buf.sums(i) += other.sums(i); i += 1 }
    buf
  }

  override def eval(buf: VecSumU6.Buf): Any =
    new GenericArrayData(buf.sums.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buf: VecSumU6.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.sums.length * 8)
    bb.putInt(buf.sums.length)
    buf.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): VecSumU6.Buf = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val n = bb.getInt
    val sums = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) = bb.getLong; i += 1 }
    new VecSumU6.Buf(sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumU6 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumU6 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumU6 =
    copy(child = newChildren(0))

  override def prettyName: String = "vec_sum_u6"
}

object VecSumU6 {
  final class Buf(var sums: Array[Long]) {
    def grow(n: Int): Unit = if (n > sums.length) {
      val next = new Array[Long](n)
      System.arraycopy(sums, 0, next, 0, sums.length)
      sums = next
    }
  }

  /** Spark's `round(x * 1e6)` on DOUBLE: decimal HALF_UP over the
    * shortest-decimal representation (BigDecimal.valueOf) — the identical
    * semantics of the SQL expression this aggregate replaces, NOT
    * Math.round (which is floor(x+0.5) and differs on negative .5s). */
  def roundU6(x: Double): Long = {
    val y = x * 1e6
    if (y.isNaN || y.isInfinite) return y.toLong
    java.math.BigDecimal.valueOf(y)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }
}
