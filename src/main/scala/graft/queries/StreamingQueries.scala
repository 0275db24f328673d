package graft.queries

import org.apache.spark.sql.functions._

/** Streaming-path queries surfaced through the Verify gate: the streaming
  * result must equal the batch formulation of the same logical query
  * (micro-batch CDC model, SURVEY.md §2.9). */
object StreamingQueries {

  /** q26: watermarked tumbling-window aggregation executed AS A STREAM
    * (readStream → AvailableNow → memory sink), returned as a plain
    * DataFrame. The DuckDB oracle is the batch formulation — passing means
    * the streaming and batch paths agree bit-for-bit. */
  val q26StreamingWindow: Q = Q(
    "q26_streaming_window",
    (spark, dir) => {
      // land the events as parquet (micro-batch CDC landing dir shape)
      val landing = java.nio.file.Files.createTempDirectory("graft-stream-").toString
      val ev = Tables.table(spark, dir, "events")
      ev.write.mode("overwrite").parquet(landing)
      val stream = spark.readStream.schema(ev.schema).parquet(landing)
      val agg = graft.streaming.StreamingEtl.windowedEventCounts(
        stream, lateness = "1 hour", windowLen = "1 hour")
      val qname = s"q26_sink_${System.nanoTime()}"
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname).start()
      q.processAllAvailable()
      q.stop()
      spark.table(qname).select(
        col("window.start").as("hour_start"),
        col("event_type"),
        col("n"),
        expr("CAST(sum_value AS DOUBLE)").as("sum_value"))
    },
    Some(
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** q27: sketch aggregates — HyperLogLog++ distinct estimation next to the
    * exact count it approximates (the sketch algorithm differs between
    * engines, so this entry has NO DuckDB oracle: the driver records the
    * weaker rows-only check, and the spec asserts the estimate's error bound
    * instead). At scale the sketch is the point: constant memory per group vs
    * the exact count's shuffle of every distinct value. */
  val q27SketchDistinct: Q = Q(
    "q27_sketch_distinct",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql(
        """SELECT l_returnflag,
          |  approx_count_distinct(l_partkey) AS approx_parts,
          |  count(DISTINCT l_partkey) AS exact_parts,
          |  approx_count_distinct(l_orderkey) AS approx_orders
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    },
    None)

  /** q38: KMV distinct sketch (`graft.functions.KmvDistinct`) — unlike
    * q27's HLL, the k-minimum-values estimate is DETERMINISTIC and
    * reproducible in ANSI SQL, so this sketch gets a full exact DuckDB
    * oracle: the oracle recomputes the k-th smallest md5 and applies the
    * identical (k-1)/h_k arithmetic (generated from the same Scala code,
    * [[graft.functions.KmvDistinct.oracleEstimateSql]]). The scale story is
    * the same as any sketch: 32k bytes of state per group, map-side
    * partials, no shuffle of distinct values. */
  val q38KmvSketch: Q = {
    val k = 256
    val est = graft.functions.KmvDistinct.oracleEstimateSql(k, "hx")
    Q(
      "q38_kmv_sketch",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        graft.functions.GraftFunctions.registerAll(spark)
        spark.sql(
          s"""SELECT l_returnflag,
             |  kmv_distinct(CAST(l_partkey AS STRING), $k) AS approx_parts,
             |  count(DISTINCT l_partkey) AS exact_parts
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      },
      Some(
        s"""WITH h AS (
           |  SELECT DISTINCT l_returnflag, md5(CAST(l_partkey AS STRING)) AS hx
           |  FROM lineitem),
           |r AS (
           |  SELECT l_returnflag, hx,
           |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hx) AS rn,
           |    count(*) OVER (PARTITION BY l_returnflag) AS nd
           |  FROM h),
           |kth AS (
           |  SELECT l_returnflag,
           |    CASE WHEN nd < $k THEN CAST(nd AS BIGINT) ELSE $est END AS approx_parts
           |  FROM r WHERE rn = least(nd, $k)),
           |ex AS (
           |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT kth.l_returnflag, kth.approx_parts, ex.exact_parts
           |FROM kth JOIN ex ON kth.l_returnflag = ex.l_returnflag""".stripMargin))
  }

  val all: Seq[Q] = Seq(q26StreamingWindow, q27SketchDistinct, q38KmvSketch)
}
