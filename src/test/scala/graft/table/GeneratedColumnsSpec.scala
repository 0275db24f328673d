package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Generated columns (Delta shape, expression in schema-field metadata):
  * declared once at CREATE, recomputed by every write funnel — the batch
  * may omit them and a supplied value is overwritten, so a generated
  * PARTITION column is provably consistent with its source column. */
class GeneratedColumnsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("generated partition column: computed at CREATE, recomputed on append, pruned") {
    val root = tmpDir("gc-")
    val t = VersionedTable(root)
    t.commit(
      Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 09:00:00")))
        .toDF("id", "ts"),
      partitionBy = Seq("day"),
      generatedColumns = Map("day" -> "CAST(ts AS DATE)"))
    assert(t.read(spark).columns.toSeq === Seq("id", "ts", "day"))
    // the batch OMITS day: recomputed from the recorded expression
    t.append(Seq((3L, ts("2024-01-02 23:00:00"))).toDF("id", "ts"))
    // a SUPPLIED day is overwritten with the computed value
    t.append(Seq((4L, ts("2024-01-03 01:00:00"), java.sql.Date.valueOf("1999-01-01")))
      .toDF("id", "ts", "day"))
    val rows = t.read(spark).selectExpr("id", "CAST(day AS STRING)")
      .as[(Long, String)].collect().sorted.toSeq
    assert(rows === Seq((1L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-02"), (4L, "2024-01-03")))
    // manifest partition pruning on the generated column
    val (df, kept, total) = t.readPartitioned(spark, "day = DATE'2024-01-02'")
    assert(kept < total)
    assert(df.select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("writes that would desynchronize a generated column refuse") {
    val root = tmpDir("gc-guard-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("id", "ts", "amt"),
      partitionBy = Seq("day"),
      generatedColumns = Map("day" -> "CAST(ts AS DATE)"))
    // SET of the generated column itself
    intercept[IllegalArgumentException](
      t.update(spark, "id = 1", Map("day" -> "DATE'1999-01-01'")))
    // SET of the SOURCE column its expression reads
    intercept[IllegalArgumentException](
      t.update(spark, "id = 1", Map("ts" -> "ts + INTERVAL 2 DAYS")))
    // unrelated columns update fine
    val (_, n) = t.update(spark, "id = 1", Map("amt" -> "amt + 1"))
    assert(n === 1)
    // merge update clauses hit the same guard
    intercept[IllegalArgumentException] {
      t.mergeCow(spark, Seq((1L, ts("2030-01-01 00:00:00"))).toDF("k", "nts"),
        "source.k = target.id", targetKey = "id", sourceKey = "k",
        whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("ts" -> "source.nts"))))
    }
  }

  test("COPY INTO and dynamic partition overwrite recompute generated columns") {
    val root = tmpDir("gc-ci-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, ts("2024-01-01 10:00:00"))).toDF("id", "ts"),
      partitionBy = Seq("day"),
      generatedColumns = Map("day" -> "CAST(ts AS DATE)"))
    // a plain landing file WITHOUT the generated column
    val src = tmpDir("gc-src-")
    Seq((2L, ts("2024-02-02 08:00:00"))).toDF("id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val (_, n) = t.copyInto(spark, src)
    assert(n === 1L)
    assert(t.read(spark).filter("id = 2").selectExpr("CAST(day AS STRING)")
      .as[String].head() === "2024-02-02")
    // dynamic overwrite of one day, batch omits the generated column
    t.overwritePartitions(Seq((10L, ts("2024-01-01 11:00:00"))).toDF("id", "ts"))
    assert(t.read(spark).select("id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 10L))
  }
}
