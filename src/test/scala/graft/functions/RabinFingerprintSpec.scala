package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native Rabin-Karp fingerprint against the generated Horner SQL
  * (the DuckDB oracle text, executed here by Spark with ascii() as the
  * codepoint function — both engines' substr/length are codepoint-based,
  * so q4's gate run then proves the DuckDB leg). */
class RabinFingerprintSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "", "a", "short", "exactly8", "just over eight chars",
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaaaaa", // heavy duplicate grams
    "ab" * 40,
    "numbers 0123456789 and punct !?;:")

  test("native eval equals the generated Horner SQL for k=8") {
    GraftFunctions.registerAll(spark)
    val gram = RabinFingerprint.oracleGramSql("text", "i", 8, "ascii")
    texts.toDF("text").createOrReplaceTempView("rfp_in")
    val rows = spark.sql(
      s"""SELECT text,
         |  rabin_fingerprint(text, 8).fingerprint AS nf,
         |  rabin_fingerprint(text, 8).n_distinct_grams AS nd,
         |  array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
         |    i -> $gram)) AS sf,
         |  CAST(size(array_distinct(transform(sequence(1, greatest(length(text) - 7, 1)),
         |    i -> $gram))) AS BIGINT) AS sd
         |FROM rfp_in""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"fingerprint mismatch for '${r.getString(0)}'")
      assert(r.getLong(2) === r.getLong(4), s"distinct mismatch for '${r.getString(0)}'")
    }
  }

  test("short and empty texts produce exactly one gram") {
    val one = RabinFingerprint.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(""), 8)
    assert(one.getLong(1) === 1L) // n_distinct_grams
    assert(one.getLong(0) === 0L) // all-pad gram hashes to 0
    val short = RabinFingerprint.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"), 8)
    assert(short.getLong(1) === 1L)
    // 'a'*B + 'b', then six zero-pad steps: h * B^6 mod P
    var h = (97L * RabinFingerprint.B + 98L) % RabinFingerprint.P
    (0 until 6).foreach(_ => h = (h * RabinFingerprint.B) % RabinFingerprint.P)
    assert(short.getLong(0) === h)
  }

  test("duplicate grams collapse in the distinct count") {
    val r = RabinFingerprint.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaaaaaaaa"), 8)
    // 3 positions, all grams "aaaaaaaa" → 1 distinct
    assert(r.getLong(1) === 1L)
  }
}
