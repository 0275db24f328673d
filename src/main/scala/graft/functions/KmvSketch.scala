package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the deterministic sibling of
  * `approx_count_distinct`: same constant-memory/mergeable scaling story
  * (SURVEY.md §2.12 sketches; the reference's word-count-scale jobs never
  * need it, a 100 TB distinct does), but with a result a second engine can
  * reproduce bit-for-bit, so the driver's DuckDB oracle checks it EXACTLY
  * rather than rows-only.
  *
  * Algorithm (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002): hash every value to uniform [0,1); keep the k
  * smallest DISTINCT hashes; if fewer than k distinct values exist the
  * sketch IS the exact count, otherwise estimate (k-1)/h_k where h_k is the
  * k-th smallest hash. Here the hash is the md5 hex digest of the value's
  * string form — fixed-width lowercase hex, so string order == numeric
  * order and DuckDB's `md5()` + window `row_number` reproduce the exact
  * same k-th minimum; the fraction h_k is the first 13 hex digits (52 bits,
  * exactly representable in an IEEE double) over 16^13.
  *
  * Buffer: a bounded `java.util.TreeSet[String]` of at most k 32-char
  * digests (dedup + order in one structure); merge is bounded union.
  * Serialized size is at most 4 + 32k bytes.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires STRING (cast the column), got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(
      buffer: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, KmvDistinct.md5Hex(v.asInstanceOf[UTF8String].getBytes))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  /** Bounded-set insert: keep only the k smallest distinct digests. */
  private def insert(buffer: java.util.TreeSet[String], hex: String): Unit = {
    if (buffer.size < k) { buffer.add(hex); () }
    else if (hex.compareTo(buffer.last) < 0 && buffer.add(hex)) {
      buffer.pollLast(); ()
    }
  }

  override def eval(buffer: java.util.TreeSet[String]): Any =
    if (buffer.size < k) buffer.size.toLong
    else {
      // h_k as first-13-hex-digit fraction; the oracle mirrors this exact
      // arithmetic (Horner int, /2^52, (k-1)/frac, floor), so every IEEE
      // step is the same operation in the same order in both engines.
      val fracInt = math.max(java.lang.Long.parseLong(buffer.last.substring(0, 13), 16), 1L)
      math.floor((k - 1).toDouble / (fracInt.toDouble / 4503599627370496.0)).toLong
    }

  override def serialize(buffer: java.util.TreeSet[String]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 32)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.put(it.next().getBytes("US-ASCII"))
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[String] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val n = bb.getInt
    val out = new java.util.TreeSet[String]()
    val one = new Array[Byte](32)
    var i = 0
    while (i < n) { bb.get(one); out.add(new String(one, "US-ASCII")); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xF)
      out(i * 2 + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** The DuckDB-side estimate expression over a column `hx` holding the
    * k-th smallest md5 hex digest: Horner-parse the first 13 hex digits to
    * an integer, then the same (k-1)/(h/2^52) floor as [[KmvDistinct.eval]].
    * Generated here so the Scala eval and the oracle SQL can never drift;
    * written in the instr/substr dialect intersection so the SAME text runs
    * in Spark (spec pin) and DuckDB (gate oracle). */
  def oracleEstimateSql(k: Int, hxCol: String): String = {
    val horner = (1 to 13)
      .map(i => s"CAST(instr('0123456789abcdef', substr($hxCol, $i, 1)) - 1 AS BIGINT)")
      .reduce((acc, d) => s"($acc * 16 + $d)")
    s"CAST(floor(${k - 1}e0 / (CAST(greatest($horner, 1) AS DOUBLE) / 4503599627370496e0)) AS BIGINT)"
  }
}
