package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-fingerprint expression: the lexicographic min over all
  * character k-gram md5 prefixes of a string — the document-fingerprint
  * operator (TextQueries t4) as one tight pass (SURVEY.md §2.10 preference
  * (b)). Bit-identical to the SQL formulation
  * `array_min(transform(sequence(1, len-k+1), i -> substr(md5(substr(text,i,k)),1,16)))`:
  * the min over 16-hex-char prefixes equals the unsigned min of the first 8
  * digest bytes (hex is order-preserving), hex-encoded once at the end.
  * Inputs shorter than k hash their whole selves, matching `substr`'s
  * clamping — including the empty string, which hashes md5("") exactly like
  * the SQL fold's `sequence(1, greatest(len-k+1, 1))` single empty gram (so
  * the expression never introduces a null the codegen path would mishandle).
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.fingerprint(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingMinHash.fingerprint($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_min_hash"
}

object RollingMinHash {
  private val HexChars = "0123456789abcdef".toCharArray
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Min md5-prefix over the k-grams of `text`, on UTF-8 BYTES windows of the
    * string's chars (gram extraction matches Spark's substr on the string).
    * Returns the 16-hex-char prefix of the winning digest. */
  def fingerprint(text: UTF8String, k: Int): UTF8String = {
    val n = text.numChars()
    val md = digestTL.get()
    val grams = math.max(n - k + 1, 1) // n == 0 → one empty gram = md5("")
    var minHi = -1L // unsigned compare via java.lang.Long.compareUnsigned
    var i = 0
    var first = true
    while (i < grams) {
      val gram = text.substringSQL(i + 1, k) // 1-based, clamped like substr
      md.reset()
      md.update(gram.getBytes)
      val d = md.digest()
      var hi = 0L
      var b = 0
      while (b < 8) { hi = (hi << 8) | (d(b) & 0xFFL); b += 1 }
      if (first || java.lang.Long.compareUnsigned(hi, minHi) < 0) {
        minHi = hi
        first = false
      }
      i += 1
    }
    val cs = new Array[Byte](16)
    var b = 0
    while (b < 8) {
      val byte = ((minHi >>> ((7 - b) * 8)) & 0xFF).toInt
      cs(b * 2) = HexChars(byte >>> 4).toByte
      cs(b * 2 + 1) = HexChars(byte & 0xF).toByte
      b += 1
    }
    UTF8String.fromBytes(cs)
  }
}
