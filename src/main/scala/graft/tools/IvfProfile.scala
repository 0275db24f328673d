package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch dev probe: job census of the one-time IVF cold build (not a
  * named gate query, so graft.Profile cannot reach it). */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write
        .format("noop").mode("overwrite").save()
      catch { case _: Exception => () }
    }
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("")
        starts.put(js.jobId, (js.time, d)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, d) =>
          rows.add((je.jobId, t0, je.time, d)) }
      }
    })
    val t0 = System.nanoTime()
    val sec = graft.queries.SimilarityQueries.buildIndexCold(spark, sfDir)
    val t1 = System.nanoTime()
    Thread.sleep(500)
    println(f"[ivfprofile] buildIndexCold reported ${sec}%.2f s (wall ${(t1 - t0) / 1e9}%.2f s)")
    import scala.jdk.CollectionConverters._
    val sorted = rows.asScala.toSeq.sortBy(_._1)
    val inJobs = sorted.map(r => r._3 - r._2).sum
    println(f"[ivfprofile] ${sorted.size} jobs, ${inJobs / 1e3}%.2f s inside jobs, ${(t1 - t0) / 1e9 - inJobs / 1e3}%.2f s between")
    sorted.foreach { case (id, s, e, d) =>
      println(f"[ivfprofile]   job $id%4d ${e - s}%6d ms  $d")
    }
    spark.stop()
  }
}
