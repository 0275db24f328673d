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

  test("vec_dot is registered for SQL and codegen-evaluates") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT vec_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }
}
