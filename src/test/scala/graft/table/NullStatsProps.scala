package graft.table

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Soundness property for nullCount-stat file skipping
  * ([[VersionedTable.readBounded]]'s `nullness` pass): for ANY data layout
  * — random null density (including all-null and no-null columns), random
  * partitioning, null-clustered or interleaved, after COW deletes, and
  * after an ANALYZE backfill onto a stats-less commit — an IS NULL /
  * IS NOT NULL pruned read must return exactly the rows the unpruned read
  * filters to. A prune that dropped a live file loses rows silently; row
  * equality across a random layout stream proves every skip conservative. */
object NullStatsProps extends Properties("NullStats") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val caseGen: Gen[(Int, Int, Int, Boolean, Boolean, Boolean)] = for {
    n <- Gen.chooseNum(1, 400)
    nullPct <- Gen.oneOf(0, 10, 50, 90, 100)
    parts <- Gen.chooseNum(1, 4)
    clustered <- Gen.oneOf(true, false) // nulls sorted together vs interleaved
    deleteSome <- Gen.oneOf(true, false) // a COW delete after the write
    analyzeBackfill <- Gen.oneOf(true, false) // stats-off commit + ANALYZE
  } yield (n, nullPct, parts, clustered, deleteSome, analyzeBackfill)

  property("nullness-pruned read ≡ unpruned read + row filter") =
    Prop.forAll(caseGen) { case (n, nullPct, parts, clustered, deleteSome, analyze) =>
      val root = tmpDir("nsp-") + "/t"
      val df = spark.range(0, n.toLong).selectExpr(
        "id AS k",
        s"CASE WHEN pmod(hash(id), 100) < $nullPct THEN NULL " +
          "ELSE concat('v', id) END AS v")
      val t = VersionedTable(root)
      if (analyze) {
        t.commit(df, numPartitions = Some(parts), collectStats = false)
        t.analyzeStats(spark)
      } else t.commit(df, numPartitions = Some(parts),
        sortBy = if (clustered) Seq("v") else Seq("k"))
      if (deleteSome) t.delete(spark, "pmod(k, 7) = 0")
      def rowsOf(q: (DataFrameAlias, Int, Int), wantNull: Boolean): Seq[Long] = {
        val (prunedDf, kept, total) = q
        assert(kept <= total)
        prunedDf.filter(if (wantNull) "v IS NULL" else "v IS NOT NULL")
          .select("k").as[Long].collect().sorted.toSeq
      }
      val full = t.read(spark)
      val expNull = full.filter("v IS NULL").select("k").as[Long].collect().sorted.toSeq
      val expNot = full.filter("v IS NOT NULL").select("k").as[Long].collect().sorted.toSeq
      val gotNull = rowsOf(t.readBounded(spark, Nil,
        nullness = Seq(("v", true))), wantNull = true)
      val gotNot = rowsOf(t.readBounded(spark, Nil,
        nullness = Seq(("v", false))), wantNull = false)
      Prop(gotNull == expNull && gotNot == expNot) :|
        s"n=$n nullPct=$nullPct parts=$parts clustered=$clustered " +
        s"delete=$deleteSome analyze=$analyze " +
        s"null ${gotNull.size}/${expNull.size} notNull ${gotNot.size}/${expNot.size}"
    }

  private type DataFrameAlias = org.apache.spark.sql.DataFrame
}
