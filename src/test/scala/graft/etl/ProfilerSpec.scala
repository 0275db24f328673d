package graft.etl

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** One-pass column profiling: null accounting, type routing (numeric vs
  * string stats), decimal-exact means, NDV modes, and the JSON stage face. */
class ProfilerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.25), Some("b")),
    (2L, Some(20.75), Some("a")),
    (3L, None, Some("a")),
    (4L, Some(20.75), None)
  ).toDF("id", "amount", "tag")

  test("profiles numeric and string columns in one pass") {
    val p = Profiler.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "amount", "tag"))

    val id = p("id")
    assert(id.getLong(1) === 4L)           // n_rows
    assert(id.getLong(2) === 4L)           // n_nonnull
    assert(id.getLong(3) === 4L)           // n_distinct
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 4.0)
    assert(id.getDouble(6) === 2.5)        // mean
    assert(id.isNullAt(7) && id.isNullAt(8))

    val amount = p("amount")
    assert(amount.getLong(2) === 3L)       // null excluded from n_nonnull
    assert(amount.getLong(3) === 2L)       // distinct over non-null values
    assert(amount.getDouble(6) === (10.25 + 20.75 + 20.75) / 3) // decimal-exact

    val tag = p("tag")
    assert(tag.getLong(2) === 3L && tag.getLong(3) === 2L)
    assert(tag.isNullAt(4) && tag.isNullAt(5) && tag.isNullAt(6))
    assert(tag.getString(7) === "a" && tag.getString(8) === "b")
  }

  test("column selection and unknown columns") {
    val p = Profiler.profile(df, cols = Seq("id"))
    assert(p.collect().map(_.getString(0)).toSeq === Seq("id"))
    val e = intercept[IllegalArgumentException](
      Profiler.profile(df, cols = Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }

  test("approx NDV mode still counts exactly at tiny cardinality") {
    val p = Profiler.profile(df, cols = Seq("tag"), exactNdv = false)
    assert(p.collect().head.getLong(3) === 2L)
  }

  test("timestamps render in fixed-width microsecond format") {
    val t = Seq(java.sql.Timestamp.valueOf("2024-03-01 12:34:56.5"))
      .toDF("ts")
    val row = Profiler.profile(t).collect().head
    assert(row.getString(7) === "2024-03-01 12:34:56.500000")
    assert(row.getString(8) === "2024-03-01 12:34:56.500000")
  }

  test("ProfileTransform stage parses from JSON and registers its view") {
    df.createOrReplaceTempView("prof_in")
    val spec = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "ProfileTransform", "name": "p", "inputView": "prof_in",
        |   "outputView": "prof_out", "columns": ["id", "tag"]}
        |]}""".stripMargin)
    spec.run(spark, Map.empty)
    assert(spark.table("prof_out").collect().map(_.getString(0)).toSet ===
      Set("id", "tag"))
  }
}
