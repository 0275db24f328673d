package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileT4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.table(spark, dir, "documents")
    docs.limit(10).write.format("noop").mode("overwrite").save()
    t("rolling_min_hash only")(docs.selectExpr("doc_id", "rolling_min_hash(text, 8)")
      .write.format("noop").mode("overwrite").save())
    t("n_distinct_grams only")(docs.selectExpr("doc_id",
      """size(array_distinct(transform(sequence(1, greatest(length(text) - 7, 1)),
        |    i -> substr(text, i, 8))))""".stripMargin)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
