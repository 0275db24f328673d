// scratch profiler: stage timings for d2 (run via sbt "Test/runMain" not shipped)
package graft.tools

import graft.queries.{DedupQueries, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").limit(10).write.format("noop").mode("overwrite").save()

    val shinglesExpr =
      """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
        |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""".stripMargin
    val shinglesLet =
      """flatten(transform(array(split(text, ' ')), w ->
        |  transform(sequence(1, greatest(size(w) - 2, 1)),
        |    i -> concat_ws(' ', slice(w, i, 3)))))""".stripMargin
    val docs = Tables.table(spark, dir, "documents")
    t("explode only")(docs.select(col("doc_id"), explode(expr(shinglesExpr)).as("shingle"))
      .write.format("noop").mode("overwrite").save())
    t("explode only (let-bound split)")(docs.select(col("doc_id"), explode(expr(shinglesLet)).as("shingle"))
      .write.format("noop").mode("overwrite").save())
    t("equal?")(assert(docs.select(expr(shinglesExpr).as("a"), expr(shinglesLet).as("b"))
      .filter("a != b").count() == 0))
    val sh = docs.select(col("doc_id"), explode(expr(shinglesExpr)).as("shingle")).distinct().persist()
    t("shingles distinct + persist")(sh.count())
    val counts = t("counts") { val c = sh.groupBy("doc_id").agg(count(lit(1)).as("n")); c.write.format("noop").mode("overwrite").save(); c }
    val buckets = sh.groupBy("shingle").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
    t("buckets")(buckets.write.format("noop").mode("overwrite").save())
    val inter = buckets
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    struct(x AS a_id, y AS b_id))))""".stripMargin)).as("p"))
      .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    t("pair explode + count")(inter.write.format("noop").mode("overwrite").save())
    val out = inter
      .join(counts.toDF("a_id", "na"), "a_id")
      .join(counts.toDF("b_id", "nb"), "b_id")
      .filter(expr("CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5"))
    t("full rest")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
