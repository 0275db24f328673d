package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan audit for the round-12 gate entries (run manually:
  * `sbt "Test/runMain graft.tools.ExplainNew"`): prints exchange counts
  * and codegen spans so shuffle regressions are visible before they cost
  * anything at scale. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .withExtensions(new graft.catalog.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq(graft.queries.TextQueries.t21BpeEncode,
        graft.queries.SimilarityQueries.q127ForgetIndexed)) {
      val df = q.run(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== ${q.name}: exchanges=${"Exchange".r.findAllIn(plan).size} " +
        s"codegen=${"WholeStageCodegen".r.findAllIn(plan).size} " +
        s"scans=${"FileScan|Scan parquet".r.findAllIn(plan).size}")
      println(plan.linesIterator.take(8).mkString("\n"))
    }
    spark.stop()
  }
}
