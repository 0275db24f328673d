package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the KMV distinct sketch: exactness below k, error bound above
  * k, partition/merge invariance, and Scala↔SQL estimate agreement (the
  * oracle arithmetic is generated from the same object — q38 then proves
  * the full cross-engine match). */
class KmvSketchSpec extends AnyFunSuite with SparkSpec {

  private def est(n: Int, k: Int, parts: Int): Long = {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    (1 to n).map(i => s"v$i").toDF("v")
      .repartition(parts)
      .createOrReplaceTempView("kmv_in")
    spark.sql(s"SELECT kmv_distinct(v, $k) AS e FROM kmv_in")
      .collect().head.getLong(0)
  }

  test("below k the sketch is the exact distinct count") {
    assert(est(100, 256, 4) === 100L)
  }

  test("duplicates don't inflate the count") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    (1 to 300).map(i => s"v${i % 50}").toDF("v").createOrReplaceTempView("kmv_dup")
    assert(spark.sql("SELECT kmv_distinct(v, 256) AS e FROM kmv_dup")
      .collect().head.getLong(0) === 50L)
  }

  test("above k the estimate is within the KMV error bound") {
    val n = 20000
    val e = est(n, 256, 8)
    // standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(e - n).toDouble / n < 0.25, s"estimate $e vs $n")
  }

  test("estimate is invariant to partitioning (merge correctness)") {
    val a = est(5000, 64, 1)
    val b = est(5000, 64, 16)
    assert(a === b)
  }

  test("null values are ignored") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq(Some("a"), None, Some("b"), None).toDF("v").createOrReplaceTempView("kmv_null")
    assert(spark.sql("SELECT kmv_distinct(v, 16) AS e FROM kmv_null")
      .collect().head.getLong(0) === 2L)
  }

  test("Scala eval arithmetic equals the generated oracle SQL arithmetic") {
    // drive one digest through both paths: the Scala floor((k-1)/frac) and
    // the Horner SQL evaluated by Spark itself (DuckDB executes the same
    // text in the gate)
    val k = 16
    val hex = KmvDistinct.md5Hex("probe".getBytes("UTF-8"))
    val fracInt = java.lang.Long.parseLong(hex.substring(0, 13), 16)
    val scalaEst =
      math.floor((k - 1).toDouble / (fracInt.toDouble / 4503599627370496.0)).toLong
    val sql = KmvDistinct.oracleEstimateSql(k, s"'$hex'")
    val sqlEst = spark.sql(s"SELECT $sql AS e").collect().head.getLong(0)
    assert(scalaEst === sqlEst)
  }
}
