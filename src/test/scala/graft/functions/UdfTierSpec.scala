package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.10 extensibility tiers, demonstrated side by side: a plain Scala UDF
  * (the lowest tier — opaque to Catalyst, breaks codegen spans) computing the
  * same fingerprint as the native RollingMinHash Expression. The tests pin
  * (a) both tiers agree and (b) the UDF registration path works, which is
  * what a reference user migrating custom logic needs first. */
class UdfTierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("Scala UDF tier agrees with the native Expression tier") {
    GraftFunctions.registerAll(spark)
    // plain function value (not a suite member) so the closure serializes
    val fingerprintUdf: String => String = text => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val n = text.length
      val grams = math.max(n - 7, 1)
      (0 until grams).map { i =>
        val gram = text.substring(i, math.min(i + 8, n))
        md.reset()
        md.digest(gram.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString
      }.min
    }
    spark.udf.register("fingerprint_udf", fingerprintUdf)
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val mismatches = docs
      .withColumn("a", expr("rolling_min_hash(text, 8)"))
      .withColumn("b", expr("fingerprint_udf(text)"))
      .filter($"a" =!= $"b")
      .count()
    assert(mismatches === 0)
  }
}
