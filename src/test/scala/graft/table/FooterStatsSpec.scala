package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Footer-mode file statistics (optimization round 15): per-file
  * min/max/nullCount/rowCount come from the parquet footers the writer
  * already produced — no second scan of the committed data — and must be
  * BIT-IDENTICAL to the legacy scan-mode aggregation for every covered
  * type: floating bounds ride a column-pruned residual scan (footer
  * min/max are NaN-poisoned), and the documented conservative gaps
  * (oversize binary stats, INT96) record NOTHING rather than anything
  * unsafe. */
class FooterStatsSpec extends AnyFunSuite with SparkSpec {

  /** Commit `sql` twice — once per stats mode — and return both stats maps
    * keyed identically (file paths differ per commit; compare by sorted
    * per-file stats). */
  private def bothModes(sql: String, parts: Int = 3)
      : (Seq[Map[String, (String, String, String)]],
         Seq[Map[String, (String, String, String)]]) = {
    def one(mode: String): Seq[Map[String, (String, String, String)]] = {
      spark.conf.set("spark.graft.stats.mode", mode)
      try {
        val t = VersionedTable(tmpDir(s"fstats-$mode-") + "/t")
        t.commit(spark.sql(sql), numPartitions = Some(parts), sortBy = Seq("k"))
        val stats = t.statsOf(t.resolve())
        t.filesOf(t.resolve()).map(stats(_))
      } finally spark.conf.unset("spark.graft.stats.mode")
    }
    (one("footer"), one("scan"))
  }

  test("footer stats ≡ scan stats across the covered type menu") {
    val (footer, scan) = bothModes(
      """SELECT id AS k,
        |  CAST(id AS INT) AS i32,
        |  CAST(id AS SMALLINT) AS i16,
        |  CAST(id AS TINYINT) AS i8,
        |  CAST(id * 1.25 AS DECIMAL(12,2)) AS money,
        |  concat('väl-', lpad(CAST(id AS STRING), 4, '0'), '-多字节') AS s,
        |  CASE WHEN id % 5 = 0 THEN NULL ELSE concat('n', id) END AS maybe,
        |  timestampadd(SECOND, CAST(id AS INT),
        |    TIMESTAMP'2026-01-02 03:04:05.25') AS ts,
        |  date_add(DATE'2026-01-02', CAST(id AS INT)) AS dt,
        |  named_struct('fmt', CASE WHEN id % 2 = 0 THEN 'png' ELSE 'avif' END,
        |               'kb', id * 3) AS meta
        |FROM range(0, 120)""".stripMargin)
    assert(footer.size === scan.size)
    // every scan-recorded key must exist footer-side with the same triple
    // (and vice versa): the modes may not drift on ANY covered column,
    // including nested dotted leaves, nullCounts, and __rows
    footer.zip(scan).zipWithIndex.foreach { case ((f, s), i) =>
      assert(f === s, s"file #$i: footer/scan stats drifted")
    }
    // sanity on content: timestamps render Spark-style and prune as strings
    val tsStats = footer.map(_("ts"))
    assert(tsStats.forall { case (mn, mx, kind) =>
      kind == "str" && mn.startsWith("2026-01-02 03:") && mn <= mx })
    assert(footer.forall(_.contains("meta.kb")))
    assert(footer.forall(_.contains("money")))
    assert(footer.forall(m =>
      m.contains(s"${VersionedTable.NullCountPrefix}maybe")))
  }

  test("floating bounds ride the residual scan: footer mode ≡ scan mode") {
    // footer min/max for FLOAT/DOUBLE are NaN-poisoned, so footer mode
    // sources them from a column-pruned residual scan — the recorded
    // triples (bounds, nullCounts, rows) must be bit-identical to scan mode
    val (footer, scan) = bothModes(
      """SELECT id AS k, CAST(id AS DOUBLE) / 4 AS d,
        |  CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS FLOAT) END AS f
        |FROM range(0, 90)""".stripMargin)
    footer.zip(scan).foreach { case (f, s) => assert(f === s) }
    footer.foreach { m =>
      assert(m.contains("d") && m.contains("f"),
        "the residual scan must supply floating bounds")
      assert(m.contains(s"${VersionedTable.NullCountPrefix}f"))
      assert(m.contains(VersionedTable.RowCountStat))
    }
  }

  test("NaN-poisoned double footer stats never mislead pruning") {
    // the poison shape from the probe: {1.5, NaN, -0.0} records footer
    // min=max=0.0 — trusting it would skip files a 'd >= 1' read needs.
    // Footer mode must instead record the residual scan's Spark-semantics
    // stats (max = "NaN", unparseable as a number => never skips on it)
    spark.conf.set("spark.graft.stats.mode", "footer")
    try {
      val t = VersionedTable(tmpDir("fstats-nan-") + "/t")
      t.commit(spark.sql(
        """SELECT * FROM VALUES (1L, CAST(1.5 AS DOUBLE)),
          |  (2L, CAST('NaN' AS DOUBLE)), (3L, CAST(-0.0 AS DOUBLE))
          |AS t(k, d)""".stripMargin), numPartitions = Some(1))
      val dStats = t.statsOf(t.resolve()).head._2("d")
      assert(dStats._2 === "NaN", "Spark max semantics: NaN is greatest")
      val (df, kept, total) = t.readBounded(spark, Seq(("d", Some("1"), None)))
      assert(kept === total, "an unparseable NaN max bound never skips")
      // Spark comparison semantics: NaN > every value, so NaN >= 1 holds too
      assert(df.filter("d >= 1").count() === 2L)
    } finally spark.conf.unset("spark.graft.stats.mode")
  }

  test("oversize binary stats fall away whole, short columns survive") {
    spark.conf.set("spark.graft.stats.mode", "footer")
    try {
      val t = VersionedTable(tmpDir("fstats-big-") + "/t")
      t.commit(spark.sql(
        "SELECT id AS k, repeat('y', 5000) AS big, concat('s', id) AS s " +
        "FROM range(0, 10)"), numPartitions = Some(1))
      val m = t.statsOf(t.resolve()).head._2
      assert(!m.contains("big"), "parquet drops >4KB stats; so must we")
      assert(m.contains("s") && m.contains("k"))
    } finally spark.conf.unset("spark.graft.stats.mode")
  }

  test("all-null column: nullCount recorded, no bounds — both modes agree") {
    val (footer, scan) = bothModes(
      "SELECT id AS k, CAST(NULL AS STRING) AS v FROM range(0, 30)", parts = 1)
    assert(footer === scan)
    assert(!footer.head.contains("v"))
    assert(footer.head(s"${VersionedTable.NullCountPrefix}v")._1 === "30")
  }

  test("partitioned commit re-injects partition-value stats identically") {
    def one(mode: String): (Seq[String], Map[String, Map[String, (String, String, String)]]) = {
      spark.conf.set("spark.graft.stats.mode", mode)
      try {
        val t = VersionedTable(tmpDir(s"fstats-part-$mode-") + "/t")
        t.commit(spark.sql(
          "SELECT id AS k, CAST(id % 3 AS STRING) AS p FROM range(0, 60)"),
          partitionBy = Seq("p"))
        (t.filesOf(t.resolve()).map(_.replaceAll("data/[^/]+/", "data/<id>/")
           .replaceAll("part-(\\d+)-[0-9a-f\\-]+", "part-$1")),
         t.statsOf(t.resolve()).map { case (f, m) =>
           f.replaceAll("data/[^/]+/", "data/<id>/").replaceAll("part-(\\d+)-[0-9a-f\\-]+", "part-$1") -> m })
      } finally spark.conf.unset("spark.graft.stats.mode")
    }
    val (ff, fs) = one("footer")
    val (sf, ss) = one("scan")
    assert(ff === sf)
    assert(fs === ss)
    assert(fs.values.forall(_.contains("p")), "partition col stats re-injected")
  }

  test("heterogeneous adoption batch: every file's OWN float leaves get bounds") {
    // a CONVERT-style batch whose files were written at different schema
    // epochs: float-leaf discovery must be per FILE (grouped residual
    // scans), not derived from files.head — head-only discovery silently
    // dropped the other files' floating bounds (round-15 verdict item 8)
    val root = tmpDir("fstats-hetero-")
    def writeOne(sql: String, name: String): String = {
      val stage = tmpDir("fstats-hetero-stage-")
      spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(root, name))
      name
    }
    // alphabetical head (a.parquet) is the FLOAT-FREE file — exactly the
    // shape that lost every other file's bounds under head-only discovery
    val fa = writeOne("SELECT id AS k FROM range(0, 20)", "a.parquet")
    val fb = writeOne(
      "SELECT id AS k, CAST(id AS DOUBLE) / 2 AS d FROM range(0, 20)", "b.parquet")
    val fc = writeOne(
      "SELECT id AS k, CAST(id AS FLOAT) * 2 AS f FROM range(0, 20)", "c.parquet")
    val t = VersionedTable(root)
    def statsIn(mode: String): Map[String, Map[String, (String, String, String)]] = {
      spark.conf.set("spark.graft.stats.mode", mode)
      try t.collectFileStats(spark, commitId = "", Seq(fa, fb, fc))
      finally spark.conf.unset("spark.graft.stats.mode")
    }
    val footer = statsIn("footer")
    assert(footer(fb).contains("d"), "b.parquet's double bounds must be recorded")
    assert(footer(fc).contains("f"), "c.parquet's float bounds must be recorded")
    assert(!footer(fa).contains("d") && !footer(fa).contains("f"))
    // exact bounds (range(0,20): d = id/2 ∈ [0, 9.5], f = id*2 ∈ [0, 38])
    assert(footer(fb)("d") === (("0.0", "9.5", "num")))
    assert(footer(fc)("f") === (("0.0", "38.0", "num")))
    assert(footer(fb)(VersionedTable.RowCountStat)._1 === "20")
    // (the legacy scan mode reads the whole batch under ONE inferred schema
    // and cannot even see heterogeneous leaves — no cross-mode pin here)
  }

  test("timestamps now write as TIMESTAMP_MICROS and range-prune") {
    spark.conf.set("spark.graft.stats.mode", "footer")
    try {
      val t = VersionedTable(tmpDir("fstats-ts-") + "/t")
      t.commit(spark.sql(
        """SELECT id AS k,
          |  timestampadd(HOUR, CAST(id AS INT), TIMESTAMP'2026-01-01 00:00:00') AS ts
          |FROM range(0, 96)""".stripMargin),
        numPartitions = Some(4), sortBy = Seq("ts"))
      val (df, kept, total) = t.readBounded(spark,
        Seq(("ts", Some("2026-01-04 00:00:00"), None)))
      assert(kept < total, "micros timestamps must carry footer bounds that skip")
      assert(df.filter("ts >= TIMESTAMP'2026-01-04 00:00:00'").count() === 24L)
    } finally spark.conf.unset("spark.graft.stats.mode")
  }
}
