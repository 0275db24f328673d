package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Nested additive schema evolution on append (Delta mergeSchema parity):
  * extra struct fields widen the recorded type nullable, older files read
  * them as null, and the refusal matrix (missing nested field, changed leaf
  * type, relaxed nullability) stays as strict as the top-level one. */
class NestedEvolutionSpec extends AnyFunSuite with SparkSpec {

  test("an appended batch with an extra nested field widens; old rows read null") {
    val root = tmpDir("ne-")
    val t = VersionedTable(root)
    t.commit(spark.sql(
      "SELECT id, named_struct('a', id * 10, 'b', CAST(id AS STRING)) AS props " +
        "FROM range(3)"))
    t.append(spark.sql(
      "SELECT id, named_struct('a', id * 10, 'b', CAST(id AS STRING), " +
        "'c', id * 1.5) AS props FROM range(3, 5)"))
    val schema = t.read(spark).schema("props").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq === Seq("a", "b", "c"),
      "the new nested field appends after the prior ones")
    assert(schema("c").nullable, "evolution-added nested fields are nullable")
    val got = t.read(spark)
      .selectExpr("id", "props.a", "props.c").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDecimal(2).doubleValue())))
      .sortBy(_._1).toSeq
    assert(got === Seq((0L, 0L, None), (1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some(4.5)), (4L, 40L, Some(6.0))),
      s"older files must read the new nested field as null: $got")
    // arrays of structs widen too
    val r2 = tmpDir("ne-arr-")
    val t2 = VersionedTable(r2)
    t2.commit(spark.sql(
      "SELECT id, array(named_struct('x', id)) AS xs FROM range(2)"))
    t2.append(spark.sql(
      "SELECT id, array(named_struct('x', id, 'y', id + 1)) AS xs FROM range(2, 4)"))
    assert(t2.read(spark).selectExpr("xs[0].y").collect()
      .count(_.isNullAt(0)) === 2, "old array elements read the new field as null")
  }

  test("missing nested fields, changed leaf types, and relaxed nullability refuse") {
    val root = tmpDir("ne-ref-")
    val t = VersionedTable(root)
    t.commit(spark.sql(
      "SELECT id, named_struct('a', id, 'b', CAST(id AS STRING)) AS props " +
        "FROM range(3)"))
    // a batch whose struct LACKS a prior nested field: silent null-fill is
    // a data hole, not evolution
    val e1 = intercept[IllegalArgumentException](t.append(spark.sql(
      "SELECT id, named_struct('a', id) AS props FROM range(3, 4)")))
    assert(e1.getMessage.contains("missing nested field"))
    // a changed nested leaf type refuses with the path in the message
    val e2 = intercept[IllegalArgumentException](t.append(spark.sql(
      "SELECT id, named_struct('a', CAST(id AS STRING), 'b', CAST(id AS STRING)) " +
        "AS props FROM range(3, 4)")))
    assert(e2.getMessage.contains("props.a"))
    // rows unchanged after the refusals
    assert(t.read(spark).count() === 3)
  }
}
