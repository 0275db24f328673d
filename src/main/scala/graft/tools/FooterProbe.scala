package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch dev probe (NOT driver contract, NOT shipped behavior): what do
  * parquet-mr 1.16 footers actually record for min/max/nullCount across the
  * engine's stat-column type menu? Evidence for the footer-stats design in
  * OPTIMIZATION_r15.md — truncation, NaN, -0.0, logical-type rendering. */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("footerprobe-").toString
    val longTail = "x" * 80 // > the 64-byte columnindex truncation unit
    val huge = "y" * 5000   // > the 4 KB footer stats drop threshold
    spark.sql(
      s"""SELECT * FROM VALUES
         |  (1L, CAST(1.5 AS DOUBLE), 'apple', TIMESTAMP'2026-01-02 03:04:05.25',
         |   DATE'2026-01-02', CAST(12.34 AS DECIMAL(9,2)), named_struct('fmt', 'png', 'kb', 10L),
         |   'a$longTail', CAST(0.5 AS FLOAT), true),
         |  (2L, CAST('NaN' AS DOUBLE), 'Ζωή-多字节', TIMESTAMP'2026-01-02 03:04:05',
         |   DATE'2026-03-04', CAST(-7.1 AS DECIMAL(9,2)), named_struct('fmt', 'avif', 'kb', 99L),
         |   'b$longTail', CAST(-0.0 AS FLOAT), false),
         |  (3L, CAST(-0.0 AS DOUBLE), NULL, NULL,
         |   NULL, NULL, named_struct('fmt', 'webp', 'kb', 5L),
         |   '$huge', CAST(0.0 AS FLOAT), true)
         |AS t(id, d, s, ts, dt, dec, meta, big, f, b)""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).head
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(f), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val fm = r.getFooter
      import scala.jdk.CollectionConverters._
      for (bg <- fm.getBlocks.asScala; c <- bg.getColumns.asScala) {
        val st = c.getStatistics
        val pt = c.getPrimitiveType
        println(s"col=${c.getPath.toDotString} ptype=${pt.getPrimitiveTypeName} " +
          s"logical=${Option(pt.getLogicalTypeAnnotation).getOrElse("-")} " +
          s"stats=${if (st == null) "NULL" else
            s"empty=${st.isEmpty} hasNN=${st.isNumNullsSet} nulls=${st.getNumNulls} " +
            s"min=${Option(st.minAsString()).map(_.take(90))} max=${Option(st.maxAsString()).map(_.take(90))}"}")
      }
      println("rows=" + fm.getBlocks.asScala.map(_.getRowCount).sum)
    } finally r.close()
    // what the CURRENT scan-based stats pass records, for comparison
    val df = spark.read.parquet(out)
    import org.apache.spark.sql.functions._
    val aggs = Seq("id", "d", "s", "ts", "dt", "dec", "big", "f").flatMap(c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"), max(col(c)).cast("string").as(s"max_$c")))
    df.agg(aggs.head, aggs.tail: _*).collect().foreach(println)
    spark.stop()
  }
}
