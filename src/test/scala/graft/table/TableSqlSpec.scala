package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The maintenance-DDL dispatcher ([[TableSql]]): each verb routes to the
  * table API and returns an observable result frame. */
class TableSqlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("OPTIMIZE, ZORDER, VACUUM, HISTORY, RESTORE, SHALLOW CLONE round-trip") {
    val base = tmpDir("tsql-")
    val root = base + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).selectExpr("id", "id % 5 AS v"),
      numPartitions = Some(4))
    t.append(spark.range(100, 200).selectExpr("id", "id % 5 AS v"))

    val opt = TableSql.run(spark, s"OPTIMIZE '$root'")
    assert(opt.head.getString(0) === "OPTIMIZE" && t.resolve() === 2L)

    TableSql.run(spark, s"OPTIMIZE '$root' ZORDER BY (id, v)")
    assert(t.resolve() === 3L)

    val hist = TableSql.run(spark, s"DESCRIBE HISTORY '$root'")
    assert(hist.count() === 4) // v0..v3

    TableSql.run(spark, s"RESTORE '$root' TO VERSION AS OF 1")
    assert(t.read(spark).count() === 200)

    TableSql.run(spark, s"CREATE TABLE '$base/c' SHALLOW CLONE '$root'")
    assert(VersionedTable(base + "/c").read(spark).count() === 200)

    TableSql.run(spark, s"VACUUM '$root' RETAIN 2 VERSIONS")
    assert(t.versions().size <= 2)

    intercept[IllegalArgumentException] {
      TableSql.run(spark, s"TRUNCATE '$root'")
    }
  }

  test("paths containing a single quote address via SQL '' escaping") {
    val root = tmpDir("tsql-q-") + "/o'brien"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 10).toDF("id"))
    t.append(spark.range(10, 20).toDF("id"))
    val lit = root.replace("'", "''")
    val hist = TableSql.run(spark, s"DESCRIBE HISTORY '$lit'")
    assert(hist.count() === 2)
    val opt = TableSql.run(spark, s"OPTIMIZE '$lit'")
    assert(opt.head.getString(1) === root) // unescaped path in the status row
    assert(t.read(spark).count() === 20)
    // VACUUM reports its sweep count under `swept`, not `version`
    val vac = TableSql.run(spark, s"VACUUM '$lit' RETAIN 2 VERSIONS")
    assert(vac.columns.toSeq === Seq("operation", "path", "swept"))
  }
}
