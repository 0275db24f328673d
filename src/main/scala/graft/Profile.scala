package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (NOT driver contract): per-query Spark-job census. For each
  * named query it reports how many jobs ran, their individual wall-clock,
  * task counts and shuffle bytes — the evidence that separates "this
  * operator is data-bound" from "this operator is a parade of fixed-cost
  * jobs" (guide §1: measure first; §7.1: find where the time goes).
  * Usage: runMain graft.Profile <sfDir> <queryName ...>  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Profile <sfDir> <queryName ...>")
    val sfDir = args.head
    val only = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      .config("spark.sql.catalog.graft", classOf[graft.catalog.GraftCatalog].getName)
      .withExtensions(new graft.catalog.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the page cache + codegen the same way Bench does
    graft.queries.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").write
        .format("noop").mode("overwrite").save()
      catch { case _: Exception => () }
    }

    final case class JobRow(id: Int, desc: String, started: Long,
        var ended: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, JobRow(js.jobId, desc, js.time))
        order.add(js.jobId); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.ended = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        // attribute the stage to the most recent still-open job (local mode
        // runs queries serially; good enough for a census)
        val jid = order.toArray(Array.empty[Integer]).reverse
          .find(j => jobs.get(j) != null && jobs.get(j).ended == 0L)
        jid.map(j => jobs.get(j)).filter(_ != null).foreach { r =>
          r.stages += 1
          r.tasks += info.numTasks
          r.shuffleRead += info.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.shuffleWrite += info.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    }

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }
      .foreach { case (name, fn) =>
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        jobs.clear(); order.clear()
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Exception => println(s"[profile] $name FAILED: $e") }
        val t1 = System.nanoTime()
        spark.sparkContext.removeSparkListener(listener)
        Thread.sleep(300) // let trailing listener events drain
        val rows = order.toArray(Array.empty[Integer]).map(j => jobs.get(j))
          .filter(_ != null)
        val jobSum = rows.map(r => math.max(0L, r.ended - r.started)).sum
        println(f"\n===== $name: ${(t1 - t0) / 1e9}%.2f s total, " +
          f"${rows.length} jobs (${jobSum / 1e3}%.2f s inside jobs, " +
          f"${(t1 - t0) / 1e9 - jobSum / 1e3}%.2f s between) =====")
        rows.foreach { r =>
          val ms = math.max(0L, r.ended - r.started)
          println(f"  job ${r.id}%4d ${ms}%6d ms stages=${r.stages}%2d " +
            f"tasks=${r.tasks}%4d shufR=${r.shuffleRead}%9d shufW=${r.shuffleWrite}%9d  ${r.desc.take(100)}")
        }
      }
    spark.stop()
  }
}
