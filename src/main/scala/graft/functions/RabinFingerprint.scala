package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp document fingerprint: polynomial hashes of every character
  * k-gram, returned as struct(fingerprint = min gram hash, n_distinct_grams
  * = count of distinct gram hashes). The successor of [[RollingMinHash]]
  * for the t4 operator: the gram hash is pure modular integer arithmetic
  * ((h*B + c) mod P, Horner over codepoints) instead of an md5 per gram —
  * ~10× cheaper per position, and STILL exactly reproducible in DuckDB SQL
  * (see [[RabinFingerprint.oracleGramSql]]), because every intermediate
  * stays below 2^62: P < 2^53, so h*B < 2^62 for B = 257.
  *
  * Definition details the oracle mirrors term by term:
  *  - grams are 1-based positions 1..max(len-k+1, 1); a text shorter than
  *    k (including empty) has ONE gram;
  *  - characters are Unicode codepoints (Spark substr/DuckDB ord agree);
  *  - positions past the end contribute 0 (the short-gram padding rule,
  *    expressed as a CASE per term in the oracle);
  *  - distinctness is over gram HASH values, so the (cosmically unlikely)
  *    hash collision is the same collision in both engines.
  */
case class RabinFingerprint(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 32, s"rabin_fingerprint needs 1 <= k <= 32, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rabin_fingerprint requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("fingerprint", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    RabinFingerprint.hash(input.asInstanceOf[UTF8String], k)

  // NOTE: the companion method must NOT be named `eval` — the case class
  // inherits Expression.eval(InternalRow), which suppresses the static
  // forwarder, so generated Java would resolve `RabinFingerprint.eval` to
  // the instance method and every codegen stage containing this expression
  // would silently fall back to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RabinFingerprint.hash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RabinFingerprint =
    copy(child = newChild)

  override def prettyName: String = "rabin_fingerprint"
}

object RabinFingerprint {
  /** Largest prime below 2^53: keeps h*B below 2^62 in both engines. */
  final val P: Long = 9007199254740881L
  final val B: Long = 257L

  def hash(text: UTF8String, k: Int): InternalRow = {
    val cp = text.toString.codePoints().toArray
    val n = cp.length
    val grams = math.max(n - k + 1, 1)
    val hashes = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      var h = 0L
      var j = 0
      while (j < k) {
        val c = if (i + j < n) cp(i + j).toLong else 0L
        h = (h * B + c) % P
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    var min = hashes(0)
    i = 1
    while (i < grams) { if (hashes(i) < min) min = hashes(i); i += 1 }
    java.util.Arrays.sort(hashes)
    var distinct = 1L
    i = 1
    while (i < grams) { if (hashes(i) != hashes(i - 1)) distinct += 1; i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](min, distinct))
  }

  /** The per-gram hash as engine-portable SQL over 1-based position `i` of
    * column `textCol`: the same Horner chain as [[eval]], with the same
    * pad-with-zero rule for positions past the end. Generated here so the
    * Scala arithmetic and the oracle text cannot drift. Uses the DuckDB/
    * Spark dialect intersection (ord/ascii differ — caller passes the
    * char→codepoint function name). */
  def oracleGramSql(textCol: String, i: String, k: Int, ordFn: String): String =
    (0 until k).foldLeft("0") { (acc, j) =>
      val c = s"(CASE WHEN $i + $j <= length($textCol) " +
        s"THEN $ordFn(substr($textCol, CAST($i + $j AS INT), 1)) ELSE 0 END)"
      s"((($acc) * $B + $c) % $P)"
    }
}
