package graft.table

import java.nio.file.{Files, Paths}

/** Spark-bearing child for the cross-JVM delta-log race (CommitLogSpec):
  * appends `n` one-row batches to the table at `root` through the full
  * commit protocol (delta manifest + CAS publish + rebase retry), racing
  * the parent JVM's own appends, checkpoints, and vacuums. A ready/go
  * barrier lines the two JVMs up so the appends genuinely interleave
  * (without it the child's session startup serializes the race away).
  * Prints DONE on success; any exception escapes and fails the parent's
  * wait. */
object DeltaRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, id, nStr, readyFile, goFile) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val t = VersionedTable(root)
    Files.write(Paths.get(readyFile), Array.emptyByteArray)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!Files.exists(Paths.get(goFile)) && System.nanoTime() < deadline)
      Thread.onSpinWait()
    (0 until nStr.toInt).foreach { i =>
      t.append(Seq((id.toLong * 100000L + i, s"child$id")).toDF("id", "s"))
    }
    println(s"DONE $id")
    spark.stop()
  }
}
