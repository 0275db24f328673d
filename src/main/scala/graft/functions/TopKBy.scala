package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded top-k selection as a `TypedImperativeAggregate` —
  * `top_k_by(key, ord, k)` keeps the `k` BIGINT keys with the highest
  * `ord` (ties broken toward the LOWER key, matching
  * `max_by(key, struct(ord, -key))` and the oracle's
  * `ORDER BY ord DESC, key` ranking) and returns them best-first.
  *
  * The point is the SHUFFLE SHAPE (SURVEY.md §2.10 tier): a window
  * `row_number() ≤ k` over a (row × candidates) stream shuffles EVERY
  * candidate row to rank it, while this buffer partial-aggregates
  * map-side to ≤ k entries per group — for IVF multi-probe assignment
  * (batch × centroids candidate pairs) only one k-slot row per vector
  * crosses the wire instead of one row per centroid. State is a k-entry
  * tree (k is small: probe widths, beam sizes); serialization is
  * 4 + 16k bytes. Exact (ord, key) duplicates collapse (set semantics)
  * — impossible in the candidate streams this serves, where keys are
  * distinct within a group. */
case class TopKByAgg(
    key: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0, s"top_k_by needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(key, ord)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (key.dataType, ord.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (kt, ot) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_by requires (BIGINT, DOUBLE), got (${kt.sql}, ${ot.sql})")
    }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](TopKByAgg.Goodness)

  override def update(buffer: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val kv = key.eval(input)
    val ov = ord.eval(input)
    if (kv != null && ov != null)
      TopKByAgg.offer(buffer, k, ov.asInstanceOf[Double], kv.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      TopKByAgg.offer(buffer, k, e._1, e._2)
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buffer.size())
    val it = buffer.descendingIterator() // best-first
    var i = 0
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size() * 16)
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e._1); bb.putLong(e._2)
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val n = bb.getInt
    val set = createAggregationBuffer()
    var i = 0
    while (i < n) { set.add((bb.getDouble, bb.getLong)); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(key = newChildren(0), ord = newChildren(1))

  override def prettyName: String = "top_k_by"
}

object TopKByAgg {
  /** Ascending "goodness": higher ord is better; on equal ord, the LOWER
    * key is better — so the tree's first() is always the eviction victim. */
  private[functions] val Goodness: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

  private def offer(set: java.util.TreeSet[(Double, Long)], k: Int,
      ord: Double, key: Long): Unit = {
    if (set.size() < k) { set.add((ord, key)); () }
    else if (Goodness.compare((ord, key), set.first()) > 0) {
      set.pollFirst()
      set.add((ord, key))
      ()
    }
  }
}
