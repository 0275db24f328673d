package graft.typing

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDocSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val doc = SchemaDoc.fromJson(
    """[{"name": "id", "type": "long", "nullable": false},
      | {"name": "amount", "type": "double"},
      | {"name": "flag", "type": "boolean"},
      | {"name": "ts", "type": "timestamp", "formatters": ["yyyy/MM/dd HH:mm"]}]""".stripMargin)

  test("schema doc parses to the declared StructType") {
    assert(doc.structType === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType),
      StructField("flag", BooleanType),
      StructField("ts", TimestampType))))
  }

  test("valid rows type cleanly with an empty _errors array") {
    val raw = Seq(("7", "1.5", "1", "2024/01/02 03:04")).toDF("a", "b", "c", "d")
    val out = doc(raw, positional = true).collect().head
    assert(out.getLong(0) === 7L)
    assert(out.getDouble(1) === 1.5)
    assert(out.getBoolean(2) === true)
    assert(out.getTimestamp(3) === java.sql.Timestamp.valueOf("2024-01-02 03:04:00"))
    assert(out.getSeq[Any](4).isEmpty)
  }

  test("typing failures yield typed null + an error entry (Arc semantics)") {
    val raw = Seq(("x", "notnum", "maybe", "2024-01-02")).toDF("a", "b", "c", "d")
    val out = doc(raw, positional = true)
    val row = out.collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
    val fields = out.select(expr("transform(_errors, e -> e.field)")).as[Seq[String]].collect().head
    assert(fields === Seq("id", "amount", "flag", "ts"))
  }

  test("null for a non-nullable field is an error; nullableValues map to null") {
    val raw = Seq(("", "", "t", "2024/01/01 00:00")).toDF("a", "b", "c", "d")
    val out = doc(raw, positional = true)
    val fields = out.select(expr("transform(_errors, e -> e.field)")).as[Seq[String]].collect().head
    assert(fields === Seq("id")) // amount nullable → empty string is a clean null
    assert(out.select("amount").collect().head.isNullAt(0))
  }

  test("boolean coercion accepts the reference's int flags (1/0)") {
    val raw = Seq(("1", "2.0", "0", "2024/01/01 00:00")).toDF("a", "b", "c", "d")
    assert(doc(raw, positional = true).select("flag").collect().head.getBoolean(0) === false)
  }

  test("multiple formatters are tried in order (Arc semantics)") {
    val multi = SchemaDoc.fromJson(
      """[{"name": "ts", "type": "timestamp",
        |  "formatters": ["yyyy/MM/dd HH:mm", "yyyy-MM-dd"]}]""".stripMargin)
    val out = multi(Seq(("2024/01/02 03:04"), ("2024-05-06")).toDF("a"), positional = true)
    val rows = out.orderBy("ts").collect()
    assert(rows(0).getTimestamp(0) === java.sql.Timestamp.valueOf("2024-01-02 03:04:00"))
    assert(rows(1).getTimestamp(0) === java.sql.Timestamp.valueOf("2024-05-06 00:00:00"))
    assert(rows.forall(_.getSeq[Any](1).isEmpty))
  }

  test("failfast mode throws on the first typing error; permissive keeps rows") {
    import graft.etl.TypingTransform
    Seq(("1", "1.0", "t", "2024/01/01 00:00"), ("x", "2.0", "f", "2024/01/01 00:00"))
      .toDF("a", "b", "c", "d").createOrReplaceTempView("ff_raw")
    val docJson =
      """[{"name": "id", "type": "long", "nullable": false},
        | {"name": "amount", "type": "double"},
        | {"name": "flag", "type": "boolean"},
        | {"name": "ts", "type": "timestamp", "formatters": ["yyyy/MM/dd HH:mm"]}]""".stripMargin
    assertThrows[IllegalStateException] {
      TypingTransform("t", "ff_raw", "ff_typed", schema = Some(docJson),
        positional = true, failMode = "failfast").execute(spark, Map.empty)
    }
    TypingTransform("t", "ff_raw", "ff_typed", schema = Some(docJson),
      positional = true, failMode = "permissive").execute(spark, Map.empty)
    assert(spark.table("ff_typed").count() === 2)
  }

  test("named (non-positional) matching types by column name") {
    val raw = Seq(("5", "t"))
      .toDF("id", "flag")
      .select($"id", lit("1.0").as("amount"), $"flag", lit("2024/01/01 00:00").as("ts"))
    val out = SchemaDoc(doc.fields)(raw, positional = false).collect().head
    assert(out.getLong(0) === 5L && out.getBoolean(2) === true)
  }
}
