package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the MERGE kernel (SURVEY.md §5): ∀ random target/CDC
  * tables, the SCD2 merge satisfies the row-accounting invariants and agrees
  * with the independent window-function oracle. */
object MergeProps extends Properties("Merge") with SparkSpec {
  import spark.implicits._

  private val keyVal: Gen[(Long, String)] = for {
    k <- Gen.chooseNum(0L, 40L)
    v <- Gen.oneOf("red", "green", "blue", "gold")
  } yield (k, v)

  private val tableGen: Gen[Map[Long, String]] =
    Gen.listOfN(25, keyVal).map(_.toMap) // distinct keys via Map

  property("scd2 invariants: current rows = full-outer latest; expired = changed keys") =
    Prop.forAll(tableGen, tableGen) { (initMap, cdcMap) =>
      val initial = initMap.toSeq.toDF("id", "v")
        .select($"id", $"v", lit(true).as("iscurrent"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("valid_from"))
      val cdc = cdcMap.toSeq.toDF("id", "v")
        .select($"id", $"v", lit(true).as("iscurrent"),
          lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).as("valid_from"))
      initial.createOrReplaceTempView("p_init")
      cdc.createOrReplaceTempView("p_cdc")
      val staged = spark.sql(
        """SELECT CAST(NULL AS BIGINT) AS mergeKey, new.*
          |FROM p_init old INNER JOIN p_cdc new ON old.id = new.id
          |WHERE old.iscurrent = true AND old.v <> new.v
          |UNION
          |SELECT id AS mergeKey, * FROM p_cdc""".stripMargin)
      val merged = Merge.merge(initial, staged,
        condition = "source.mergeKey = target.id",
        whenMatchedUpdate = Some(Merge.MatchedUpdate(
          Some("target.iscurrent = true AND target.v <> source.v"),
          Map("iscurrent" -> "false"))),
        whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None, Map.empty)))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq

      val changed = initMap.keySet.intersect(cdcMap.keySet)
        .filter(k => initMap(k) != cdcMap(k))
      val current = merged.filter(_._3).map(t => t._1 -> t._2).toMap
      val expired = merged.filterNot(_._3).map(t => t._1 -> t._2).toMap

      val expectCurrent = initMap ++ cdcMap // latest state per key
      val okCurrent = Prop(current == expectCurrent) :| s"current mismatch: $current vs $expectCurrent"
      val okExpired = Prop(expired == changed.map(k => k -> initMap(k)).toMap) :| s"expired mismatch: $expired"
      val okCount = Prop(merged.size == expectCurrent.size + changed.size) :| "row accounting"
      okCurrent && okExpired && okCount
    }

  property("empty source leaves the target untouched") =
    Prop.forAll(tableGen) { initMap =>
      val initial = initMap.toSeq.toDF("id", "v")
      val empty = spark.emptyDataFrame
        .withColumn("mergeKey", lit(null).cast("bigint"))
        .withColumn("id", lit(null).cast("bigint"))
        .withColumn("v", lit(null).cast("string"))
        .limit(0)
      val merged = Merge.merge(initial, empty,
        condition = "source.mergeKey = target.id",
        whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))),
        whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None, Map.empty)))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      merged == initMap.toSet
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)
}
