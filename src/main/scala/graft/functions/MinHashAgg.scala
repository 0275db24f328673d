package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Group-level MinHash signature as a `TypedImperativeAggregate` — the
  * sketch-aggregation tier of SURVEY.md §2.10 (mutable buffer, map-side
  * partial aggregation, tiny merge state): unions every row's shingle set
  * into ONE 16-lane signature per group, so the similarity of whole
  * collections (a source, a crawl, a day of documents) can be estimated
  * from 16 values however many documents the group holds.
  *
  * The per-shingle lane hashes are identical to [[MinHashSignature]] (4 md5
  * digests split into 8-hex lanes), and the group signature is the per-lane
  * min over ALL shingles in the group — associative and commutative, so
  * partial aggregation and merge order cannot change the result, and the
  * same min is expressible in SQL for the DuckDB oracle. The buffer is 16
  * unsigned ints in a long array; serialization is 128 bytes. Empty groups
  * yield lanes of "g" (the fold identity, as the expression does).
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_agg requires ARRAY<STRING>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill[Long](MinHash.Lanes)(MinHashAgg.Empty)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashAgg.updateWith(buffer, v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHash.Lanes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = new Array[Any](MinHash.Lanes)
    var lane = 0
    while (lane < MinHash.Lanes) {
      out(lane) =
        if (buffer(lane) == MinHashAgg.Empty) UTF8String.fromString("g")
        else UTF8String.fromString(f"${buffer(lane)}%08x")
      lane += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(MinHash.Lanes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    Array.fill(MinHash.Lanes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Above any 32-bit lane value — the fold identity ("g" on eval). */
  final val Empty: Long = 0xFFFFFFFFFFL

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Prefixes = Array("0:", "1:", "2:", "3:").map(_.getBytes("UTF-8"))

  /** Fold one shingle array into the lane-minimum buffer (same lane layout
    * as [[MinHash.signature]]). */
  def updateWith(buffer: Array[Long], shingles: ArrayData): Unit = {
    val md = digestTL.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val u = shingles.getUTF8String(i)
      if (u != null) {
        val s = u.getBytes
        var p = 0
        while (p < 4) {
          md.reset()
          md.update(Prefixes(p))
          md.update(s)
          val d = md.digest()
          var k = 0
          while (k < 4) {
            val off = k * 4
            val v = ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
              ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)
            val lane = p * 4 + k
            if (v < buffer(lane)) buffer(lane) = v
            k += 1
          }
          p += 1
        }
      }
      i += 1
    }
  }
}
