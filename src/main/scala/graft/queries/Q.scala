package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness query: a Spark implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables (driver contract —
  * `SparkEntry.queries` / `SparkEntry.oracleSql`).
  *
  * Exactness discipline (so the driver's hash compare passes):
  *  - money doubles are exactly-2dp in the testdata → cast to DECIMAL before
  *    SUM, cast the final aggregate back to DOUBLE: identical bits both engines
  *  - integer-valued doubles (l_quantity) sum exactly in binary → no cast
  *  - column names are aliased identically on both sides
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** A query whose Spark side is the exact same SQL text as the oracle,
    * executed over temp views registered from the sf dir. */
  def sharedSql(name: String, sql: String): Q =
    Q(name, (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(sql) }, Some(sql))

  /** Spark SQL differs from the DuckDB oracle text (dialect divergence). */
  def dualSql(name: String, sparkSql: String, duckSql: String): Q =
    Q(name, (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(sparkSql) }, Some(duckSql))
}

/** Lifecycle/serve phase boundary for gate queries whose run is a
  * LIFECYCLE (build state, commit batches, drain streams) followed by one
  * serving read: the query calls [[markServe]] when its setup is done, and
  * the bench reports `<name>_setup` / `<name>_serve` split rows alongside
  * the combined number — a commit-cost regression and a read-path
  * regression are different bugs and deserve different numbers (the same
  * split `ivf_build_cold`/`ivf_build` already gives the index builds).
  * Correctness runs ignore the marks entirely. */
object PhaseClock {
  private val marks = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def markServe(name: String): Unit = { marks.put(name, System.nanoTime()); () }
  private[graft] def serveMarkNanos(name: String): Option[Long] =
    Option(marks.get(name)).map(_.longValue)
  private[graft] def clear(name: String): Unit = { marks.remove(name); () }
}
