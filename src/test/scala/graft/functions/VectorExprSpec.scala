package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val hofDot = (a: String, b: String) =>
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  test("vec_dot is bit-identical to the HOF fold it replaces") {
    // adversarial magnitudes: the sum order affects the low bits, so only
    // an identical left-to-right fold matches exactly
    val df = Seq.tabulate(50) { i =>
      (i.toLong,
        Array.tabulate(64)(j => math.sin(i * 64 + j) * math.pow(10, j % 7 - 3)),
        Array.tabulate(64)(j => math.cos(i * 64 + j) * math.pow(10, (j + 3) % 7 - 3)))
    }.toDF("id", "a", "b")
    val out = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot("a", "b").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null element and length mismatch yield NULL, like zip_with padding") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1D, 2D), array(3D, 4D)),
        |  (array(1D, CAST(NULL AS DOUBLE)), array(3D, 4D)),
        |  (array(1D, 2D, 5D), array(3D, 4D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3D, 4D))
        |AS t(a, b)""".stripMargin)
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot("a", "b").as("hof")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null-shape mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(got.map(_.isNullAt(0)).toSeq === Seq(false, true, true, true))
  }

  test("vec_sum_u6 matches the posexplode round-sum spelling, incl. negative .5s") {
    GraftFunctions.registerAll(spark)
    // -2.5e-6 * 1e6 = -2.5: decimal HALF_UP gives -3, Math.round would give -2
    val df = Seq(
      (1L, Array(0.1234565, -2.5e-6, 1.9999995)),
      (1L, Array(-0.1234565, 2.5e-6, -1.0)),
      (2L, Array(7.5e-7, -7.5e-7, 0.0))).toDF("g", "v")
    df.createOrReplaceTempView("vs")
    val native = spark.sql("SELECT g, vec_sum_u6(v) AS s FROM vs GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val exploded = spark.sql(
      """SELECT g, i, CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS s
        |FROM (SELECT g, posexplode(v) AS (i, x) FROM vs)
        |GROUP BY g, i ORDER BY g, i""".stripMargin)
      .collect().groupBy(_.getLong(0))
      .map { case (g, rows) => g -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(native === exploded)
  }

  test("vec_dot is registered for SQL and codegen-evaluates") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT vec_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }
}
