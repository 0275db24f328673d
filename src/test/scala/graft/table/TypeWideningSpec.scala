package graft.table

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only type widening ([[VersionedTable.alterColumnType]], Delta's
  * type-widening feature): the recorded schema widens, zero files rewrite,
  * and Spark's parquet reader materializes the stored narrower physical
  * type into the wider read schema — each transition proven against real
  * files written BEFORE the widen. */
class TypeWideningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("int->long widens metadata-only; old files read wide; appends mix") {
    val root = tmpDir("tw-")
    val t = VersionedTable(root)
    t.commit(Seq((1, "a"), (2, "b")).toDF("n", "k"))
    val filesBefore = t.history(spark).filter("version = 0")
      .head.getAs[Int]("n_files")
    t.alterColumnType("n", LongType)
    assert(t.schemaOf(t.resolve()).exists(_("n").dataType == LongType))
    // no rewrite happened: the widen commit carries the SAME file count
    assert(t.history(spark).filter("version = 1").head.getAs[Int]("n_files")
      === filesBefore)
    // old narrow files read through the wide schema
    assert(t.read(spark).select("n").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // post-widen appends land wide and mix with pre-widen files
    t.append(Seq((3L, "c")).toDF("n", "k"))
    assert(t.read(spark).select("n").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L))
    // rewrites over mixed narrow/wide files work too
    t.delete(spark, "n = 2")
    assert(t.read(spark).select("n").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("float->double and decimal precision growth widen; stats keep pruning") {
    val root = tmpDir("tw-fd-")
    val t = VersionedTable(root)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1.5f, new java.math.BigDecimal("12.34")),
        org.apache.spark.sql.Row(2.5f, new java.math.BigDecimal("5.00"))), 1),
      StructType(Seq(StructField("f", FloatType), StructField("d", DecimalType(10, 2)))))
    t.commit(df)
    t.alterColumnType("f", DoubleType)
    t.alterColumnType("d", DecimalType(16, 2))
    val rows = t.read(spark).collect()
    assert(rows.map(_.getDouble(0)).sorted.toSeq === Seq(1.5, 2.5))
    assert(rows.map(_.getDecimal(1).toPlainString).sorted.toSeq ===
      Seq("12.34", "5.00"))
  }

  test("float->double re-renders stats exactly: no wrong pruning in the " +
      "float-to-double rounding gap") {
    // scan stats mode: the rounding-gap hazard this test pins only exists
    // when floating columns carry min/max at all — the default footer mode
    // records no floating bounds (NaN-poisoned in parquet footers; see
    // FooterStatsSpec), so under it the file trivially survives
    spark.conf.set("spark.graft.stats.mode", "scan")
    try {
    val root = tmpDir("tw-gap-")
    val t = VersionedTable(root)
    // 0.1f renders as "0.1", but its exact double value is ≈0.10000000149 —
    // a predicate between the two must NOT prune the file
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0.1f), org.apache.spark.sql.Row(0.1f)), 1),
      StructType(Seq(StructField("f", FloatType))))
    t.commit(df)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(9.9f)), 1),
      StructType(Seq(StructField("f", FloatType)))))
    t.alterColumnType("f", DoubleType)
    // bounds sit strictly above double("0.1")=0.1 and below the exact
    // widened value's file max — a stale "0.1" stat string would prune
    val (out, kept, total) = t.readPruned(spark, "f", "0.100000001", "0.2")
    assert(total === 2)
    assert(kept === 1, "the 0.1f file must survive pruning after widening")
    assert(out.count() === 2, "both widened 0.1f rows match the range")
    } finally spark.conf.unset("spark.graft.stats.mode")
  }

  test("widening a Bloom-indexed column retires its sidecar gating (hash " +
      "type changed; range pruning remains)") {
    val root = tmpDir("tw-bloom-")
    val t = VersionedTable(root)
    t.setProperties(Map("bloomIndexColumns" -> "n"))
    t.commit(Seq((1, "a"), (2, "b")).toDF("n", "k"), numPartitions = Some(1))
    t.alterColumnType("n", LongType)
    assert(!VersionedTable(root).properties.get("bloomIndexColumns")
      .exists(_.split(',').contains("n")),
      "pre-widen sidecars hash the narrow type; probing them with the wide " +
        "type would wrongly prune live files")
    // the delete still finds its rows (range pruning, no Bloom skip)
    val (_, touched) = t.delete(spark, "n = 2")
    assert(touched === 1 && t.read(spark).count() === 1)
  }

  test("narrowing and lossy changes refuse") {
    val root = tmpDir("tw-no-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a", 1.0)).toDF("n", "k", "x"))
    intercept[IllegalArgumentException](t.alterColumnType("n", IntegerType))
    intercept[IllegalArgumentException](t.alterColumnType("k", LongType))
    intercept[IllegalArgumentException](t.alterColumnType("x", FloatType))
    intercept[IllegalArgumentException](t.alterColumnType("nope", LongType))
  }

  test("SQL DDL: ALTER TABLE ... ALTER COLUMN ... TYPE BIGINT via the catalog") {
    val name = s"tw${System.nanoTime()}"
    val tbl = s"graft.default.$name"
    spark.sql(s"CREATE TABLE $tbl (n INT, k STRING)")
    spark.sql(s"INSERT INTO $tbl VALUES (7, 'a')")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN n TYPE BIGINT")
    val got = spark.sql(s"SELECT n FROM $tbl").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(7L))
    // a lossy request surfaces the kernel's refusal
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN n TYPE INT")
    }
    spark.sql(s"DROP TABLE $tbl")
  }
}
