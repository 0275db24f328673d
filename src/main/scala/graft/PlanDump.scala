package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print `explain("formatted")` for named queries (all when none
  * given) — the evidence trail behind PLANS.md. Not part of the driver
  * contract. Usage: runMain graft.PlanDump <sfDir> [queryName ...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.PlanDump <sfDir> [queryName ...]")
    val sfDir = args.head
    val only = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[plandump] $name failed: $e") }
        spark.sharedState.cacheManager.clearCache()
      }
    spark.stop()
  }
}
