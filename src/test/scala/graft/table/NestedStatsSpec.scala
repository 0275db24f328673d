package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Nested-column file statistics (round 15): [[VersionedTable]] records
  * per-file min/max/nullCount for STRUCT LEAVES under dotted keys (Delta's
  * nested-stats convention), so predicates on `meta.format`-shaped columns
  * — the engine's own multimodal metadata shape (m1) — skip files at the
  * manifest instead of scanning every file. */
class NestedStatsSpec extends AnyFunSuite with SparkSpec {

  private def fixture(): VersionedTable = {
    val t = VersionedTable(tmpDir("nst-") + "/t")
    // k-sorted commit: meta.fmt/meta.kb range-cluster into files; meta.nf
    // is null on a k-range so nullCounts split all-null/mixed/zero-null
    t.commit(spark.range(0, 400).selectExpr(
      "id AS k",
      "named_struct(" +
        "'fmt', CASE WHEN id < 100 THEN 'avif' WHEN id < 200 THEN 'jpeg' " +
        "            WHEN id < 300 THEN 'png' ELSE 'webp' END, " +
        "'kb', id * 3, " +
        "'nf', CASE WHEN id < 150 THEN NULL ELSE CAST(id AS STRING) END" +
        ") AS meta",
      "CAST(id AS DOUBLE) AS v"),
      numPartitions = Some(8), sortBy = Seq("k"))
    t
  }

  test("collectFileStats records struct leaves under dotted keys") {
    val t = fixture()
    val stats = t.statsOf(t.resolve())
    assert(stats.nonEmpty)
    stats.foreach { case (f, cols) =>
      assert(cols.contains("meta.fmt"), s"$f lacks meta.fmt stats: ${cols.keys}")
      assert(cols.contains("meta.kb"), s"$f lacks meta.kb stats")
      assert(cols.contains(s"${VersionedTable.NullCountPrefix}meta.nf"),
        s"$f lacks meta.nf nullCount")
      val (mn, mx, kind) = cols("meta.kb")
      assert(kind === "num" && BigDecimal(mn) <= BigDecimal(mx))
      assert(cols("meta.fmt")._3 === "str")
    }
  }

  test("readBounded prunes files on nested bounds and nested nullness") {
    val t = fixture()
    val (df, kept, total) = t.readBounded(spark,
      Seq(("meta.fmt", Some("png"), Some("png"))))
    assert(kept < total, s"nested equality bound did not skip ($kept/$total)")
    // pruning is conservative: the kept files still hold every png row
    assert(df.filter("meta.fmt = 'png'").count() === 100L)
    val (_, keptNum, _) = t.readBounded(spark,
      Seq(("meta.kb", Some("900"), None)))
    assert(keptNum < total, "nested numeric lower bound did not skip")
    val (_, keptNull, _) = t.readBounded(spark, Nil,
      nullness = Seq(("meta.nf", true)))
    assert(keptNull < total, "nested IS NULL nullCount skipping did not engage")
    val (_, keptNotNull, _) = t.readBounded(spark, Nil,
      nullness = Seq(("meta.nf", false)))
    assert(keptNotNull < total, "nested IS NOT NULL skipping did not engage")
  }

  test("leafType resolves dotted paths with top-level precedence") {
    // NOTE a literal `meta.x` column cannot coexist with a struct leaf
    // meta.x in one TABLE anyway: parquet dot-joins column paths, so the
    // two collide at the storage layer (and the write funnel's projection
    // rejects literal dotted names upstream of stats). The precedence rule
    // still matters for the SCHEMA-level lookup shared by the stats pass
    // and checkpoint planning — exact top-level name first, struct walk
    // second, unresolvable paths None (the conjunct then contributes
    // nothing, which is always safe).
    import org.apache.spark.sql.types._
    val s = new StructType()
      .add("a.b", StringType)
      .add("a", new StructType()
        .add("b", LongType)
        .add("m", new StructType().add("deep", DoubleType))
        .add("arr", ArrayType(LongType)))
    assert(VersionedTable.leafType(s, "a.b").get.typeName === "string")
    assert(VersionedTable.leafType(s, "a.m.deep").get.typeName === "double")
    assert(VersionedTable.leafType(s, "a").get.isInstanceOf[StructType])
    assert(VersionedTable.leafType(s, "a.arr.x").isEmpty) // through an array
    assert(VersionedTable.leafType(s, "a.c").isEmpty)
    assert(VersionedTable.leafType(s, "nope").isEmpty)
  }

  test("the DSv2 catalog SQL path pushes the nested predicate and prunes") {
    val t = fixture()
    val q = spark.sql(s"SELECT k, v FROM graft.`${t.root}` WHERE meta.fmt = 'png'")
    assert(q.count() === 100L)
    // Spark's V2 translation renders the nested reference dot-joined; the
    // plan's pushed-filter rendering must carry it (that name is exactly
    // the dotted stats key, so the prune needs no mapping)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("meta.fmt"), s"nested filter not pushed:\n$plan")
    // end-to-end pruning proof on the same builder path the SQL used:
    // push the filter as Spark renders it and count the rows the scan
    // SERVES (pushed filters are residual — surviving files return all
    // their rows, so fewer-than-table rows == files skipped)
    val zone = t.statsRenderZone(spark, None, None)
    val bounds = StatsBounds.bounds(
      Array(org.apache.spark.sql.sources.EqualTo("meta.fmt", "png")), zone)
    val (df, kept, total) = t.readBounded(spark, bounds)
    assert(kept < total, s"catalog-path bounds did not skip ($kept/$total)")
    assert(df.count() < 400L && df.filter("meta.fmt = 'png'").count() === 100L)
  }
}
