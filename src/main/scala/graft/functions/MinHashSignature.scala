package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the engine's 16-lane MinHash
  * signature from a shingle array in one tight pass (SURVEY.md §2.10
  * preference (b): custom `Expression` over UDF).
  *
  * Bit-identical to the SQL higher-order fold in DedupQueries.sigExpr (and to
  * the DuckDB oracle): lane i of shingle s is the 8-hex-char slice
  * `[i*8, i*8+8)` of `md5('0:'+s) ++ md5('1:'+s) ++ md5('2:'+s) ++ md5('3:'+s)`,
  * and the signature is the per-lane lexicographic min — which this
  * implementation computes as an unsigned comparison on the 4 raw digest
  * bytes (hex encoding is order-preserving), avoiding all intermediate
  * string/array allocation. Empty input yields lanes of "g" ('g' > any hex
  * char), matching the fold's array_repeat('g', lanes) identity.
  *
  * Codegen emits a single static call, so the expression stays inside
  * whole-stage codegen; the md5 work (the actual cost) runs in
  * [[MinHash.signature]] with a thread-local digest instance.
  */
case class MinHashSignature(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHash {
  final val Lanes = 16
  private val HexChars = "0123456789abcdef".toCharArray
  private val Prefixes = Array("0:", "1:", "2:", "3:").map(_.getBytes("UTF-8"))

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One-pass signature: per lane, the minimum 4-byte digest slice over all
    * shingles (compared unsigned = lexicographic min of the hex encoding). */
  def signature(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) {
      val g = UTF8String.fromString("g")
      return new GenericArrayData(Array.fill[Any](Lanes)(g))
    }
    val md = digestTL.get()
    // per-lane current minimum as unsigned 32-bit in a long (init above max)
    val mins = Array.fill[Long](Lanes)(0xFFFFFFFFFFL)
    var i = 0
    var any = false
    while (i < n) {
      // null shingles are skipped, matching the SQL fold's least(m, NULL) = m
      val u = shingles.getUTF8String(i)
      if (u == null) { i += 1 }
      else {
      any = true
      val s = u.getBytes
      var p = 0
      while (p < 4) {
        md.reset()
        md.update(Prefixes(p))
        md.update(s)
        val d = md.digest() // 16 bytes = 32 hex chars = 4 lanes of 8 hex
        var k = 0
        while (k < 4) {
          val off = k * 4
          val v = ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
            ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)
          val lane = p * 4 + k
          if (v < mins(lane)) mins(lane) = v
          k += 1
        }
        p += 1
      }
      i += 1
      }
    }
    if (!any) {
      // all-null input behaves like the fold over no effective shingles
      val g = UTF8String.fromString("g")
      return new GenericArrayData(Array.fill[Any](Lanes)(g))
    }
    val out = new Array[Any](Lanes)
    var lane = 0
    while (lane < Lanes) {
      val v = mins(lane)
      val cs = new Array[Byte](8)
      var b = 0
      while (b < 4) {
        val byte = ((v >>> ((3 - b) * 8)) & 0xFF).toInt
        cs(b * 2) = HexChars(byte >>> 4).toByte
        cs(b * 2 + 1) = HexChars(byte & 0xF).toByte
        b += 1
      }
      out(lane) = UTF8String.fromBytes(cs)
      lane += 1
    }
    new GenericArrayData(out)
  }
}
