package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the north-star
  * extensions, §2.12) is exposed as a named query over the driver testdata,
  * each with a DuckDB oracle where ANSI-SQL-expressible.
  */
object SparkEntry {

  def allQueries: Seq[Q] = {
    val qs = CoreQueries.all ++ Scd2Queries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      SourceQueries.all ++ StreamingQueries.all ++ SqlSurfaceQueries.all ++
      TpchQueries.all ++ JoinQueries.all
    // a name collision would silently shadow a query in the toMap below,
    // shrinking the correctness gate — fail loudly instead
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q4StarJoin.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
