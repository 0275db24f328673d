package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values ([[VersionedTable.setColumnDefault]]): omitted
  * columns fill at write time, supplied values win, existing rows are
  * untouched, and the SQL DDL shapes (CREATE ... DEFAULT, ALTER ... SET /
  * DROP DEFAULT, INSERT with omitted or DEFAULT-keyword columns) route
  * through the catalog. */
class ColumnDefaultsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("append fills an omitted DEFAULT column; supplied values win; DROP restores refusal") {
    val root = tmpDir("cd-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "k", "qty"))
    t.setColumnDefault(spark, "qty", Some("42"))
    assert(t.history(spark).filter("operation = 'SET DEFAULT'").count() === 1)
    // batch omits qty: the default fills (without it, append refuses a
    // missing table column)
    t.append(Seq((3L, "c")).toDF("id", "k"))
    // batch supplies qty: the supplied value wins
    t.append(Seq((4L, "d", 7)).toDF("id", "k", "qty"))
    val got = t.read(spark).select("id", "qty").as[(Long, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 10), (2L, 20), (3L, 42), (4L, 7)),
      s"default must fill ONLY the omitting batch: $got")
    // DROP DEFAULT: omission refuses again (Delta-style schema enforcement)
    t.setColumnDefault(spark, "qty", None)
    intercept[IllegalArgumentException](t.append(Seq((5L, "e")).toDF("id", "k")))
  }

  test("defaults are constant expressions: column refs and bad casts refuse at DDL time") {
    val root = tmpDir("cd-val-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a", 1.0)).toDF("id", "k", "score"))
    intercept[IllegalArgumentException](
      t.setColumnDefault(spark, "score", Some("id + 1")))
    intercept[Exception](
      t.setColumnDefault(spark, "score", Some("not_a_function(")))
    intercept[IllegalArgumentException](
      t.setColumnDefault(spark, "nope", Some("1")))
    // a deterministic function default is fine
    t.setColumnDefault(spark, "score", Some("CAST(2.5 AS DOUBLE)"))
    t.append(Seq((2L, "b")).toDF("id", "k"))
    assert(t.read(spark).filter("id = 2").select("score").as[Double].head() === 2.5)
  }

  test("GENERATED and IDENTITY columns refuse a DEFAULT") {
    val root = tmpDir("cd-gen-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, 100L)).toDF("id", "v"),
      generatedColumns = Map("v2" -> "v * 2"))
    intercept[IllegalArgumentException](
      t.setColumnDefault(spark, "v2", Some("0")))
    t.enableIdentity(spark, "id")
    intercept[IllegalArgumentException](
      t.setColumnDefault(spark, "id", Some("0")))
    // ...but a default on an ORDINARY column of an identity table works,
    // including through the identity-allocating append
    t.setColumnDefault(spark, "v", Some("999"))
    val (_, first, _) = t.appendIdentity(spark,
      spark.range(1).select().toDF())
    assert(t.read(spark).filter(s"id = $first").select("v").as[Long].head() === 999L)
  }

  test("COPY INTO fills a DEFAULT column the source files omit; supplied columns keep values") {
    val base = tmpDir("cd-ci-")
    val t = VersionedTable(s"$base/t")
    t.commit(Seq((1L, "seed", Option(5))).toDF("id", "k", "qty"))
    t.setColumnDefault(spark, "qty", Some("42"))
    // landing batch 1 OMITS qty entirely: the default fills
    Seq((2L, "a"), (3L, "b")).toDF("id", "k")
      .coalesce(1).write.parquet(s"$base/src1")
    t.copyInto(spark, s"$base/src1")
    // landing batch 2 SUPPLIES qty (including a null): values win, null stays
    Seq((4L, "c", Some(7)), (5L, "d", Option.empty[Int])).toDF("id", "k", "qty")
      .coalesce(1).write.parquet(s"$base/src2")
    t.copyInto(spark, s"$base/src2")
    val got = t.read(spark).select("id", "qty").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .sortBy(_._1).toSeq
    assert(got === Seq(1L -> Some(5), 2L -> Some(42), 3L -> Some(42),
      4L -> Some(7), 5L -> None), s"got $got")
  }

  test("SQL DDL: CREATE ... DEFAULT, INSERT omitting the column, ALTER SET/DROP DEFAULT") {
    val tn = s"graft.default.cd_sql_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tn (id BIGINT, qty INT DEFAULT 42, k STRING)")
    spark.sql(s"INSERT INTO $tn (id, k) VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $tn VALUES (2, 7, 'b')")
    spark.sql(s"INSERT INTO $tn (id, qty, k) VALUES (3, DEFAULT, 'c')")
    val got = spark.table(tn).select("id", "qty").as[(Long, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 42), (2L, 7), (3L, 42)), s"got $got")
    // ALTER: change the default; only LATER inserts see it
    spark.sql(s"ALTER TABLE $tn ALTER COLUMN qty SET DEFAULT 100")
    spark.sql(s"INSERT INTO $tn (id, k) VALUES (4, 'd')")
    assert(spark.table(tn).filter("id = 4").select("qty").as[Int].head() === 100)
    assert(spark.table(tn).filter("id = 1").select("qty").as[Int].head() === 42,
      "existing rows must not be backfilled by a new default")
    spark.sql(s"ALTER TABLE $tn ALTER COLUMN qty DROP DEFAULT")
    // Spark's V2 INSERT contract pads an omitted NULLABLE column with null
    // once no default exists (the strict refusal lives in the declarative
    // append funnel, covered above) — assert the pad, not a throw
    spark.sql(s"INSERT INTO $tn (id, k) VALUES (5, 'e')")
    assert(spark.table(tn).filter("id = 5").select("qty").head().isNullAt(0))
    spark.sql(s"DROP TABLE $tn")
  }
}
