package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** `top_k_by(key, ord, k)` — the bounded map-side top-k aggregate behind
  * IVF multi-probe assignment. */
class TopKBySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  GraftFunctions.registerAll(spark)

  private def run(sql: String): Seq[(Long, Seq[Long])] = {
    spark.sql(sql).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq.sortBy(_._1)
  }

  test("keeps the k highest-ord keys, best-first, lower key wins ties") {
    Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.8), (1L, 13L, 0.1),
      (2L, 20L, 0.5), (2L, 21L, 0.5), (2L, 22L, 0.5), // all tied: lowest ids
      (3L, 30L, 0.3) // fewer rows than k
    ).toDF("g", "key", "ord").createOrReplaceTempView("tk")
    val got = run("SELECT g, top_k_by(key, ord, 2) FROM tk GROUP BY g")
    assert(got === Seq(
      1L -> Seq(10L, 12L), // 0.9, then 0.8
      2L -> Seq(20L, 21L), // tie broken toward the lower key
      3L -> Seq(30L)))     // short group yields a short array
  }

  test("partial aggregation across many partitions agrees with a single " +
      "partition (merge path is exact)") {
    val rows = (0L until 5000L).map(i => (i % 7, i, ((i * 2654435761L) % 1000003L).toDouble))
    val wide = rows.toDF("g", "key", "ord").repartition(32)
    wide.createOrReplaceTempView("tk_wide")
    rows.toDF("g", "key", "ord").coalesce(1).createOrReplaceTempView("tk_one")
    val a = run("SELECT g, top_k_by(key, ord, 5) FROM tk_wide GROUP BY g")
    val b = run("SELECT g, top_k_by(key, ord, 5) FROM tk_one GROUP BY g")
    assert(a === b)
    // and both agree with the window-ranked reference
    val ref = spark.sql(
      """SELECT g, key FROM (
        |  SELECT g, key, row_number() OVER (PARTITION BY g
        |    ORDER BY ord DESC, key) AS rk FROM tk_one) WHERE rk <= 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.flatMap { case (g, ks) => ks.map(g -> _) }.toSet === ref)
  }

  test("null keys and null ords are skipped; k wider than the group is safe") {
    spark.sql(
      """SELECT top_k_by(key, ord, 10) AS ks FROM VALUES
        |  (CAST(1 AS BIGINT), CAST(0.5 AS DOUBLE)),
        |  (CAST(NULL AS BIGINT), CAST(0.9 AS DOUBLE)),
        |  (CAST(2 AS BIGINT), CAST(NULL AS DOUBLE)) t(key, ord)""".stripMargin)
      .collect().map(_.getSeq[Long](0).toSeq) match {
      case Array(ks) => assert(ks === Seq(1L))
      case other => fail(s"unexpected $other")
    }
  }
}
