package graft

import org.scalatest.funsuite.AnyFunSuite

/** The whole gate swept under `spark.sql.ansi.enabled=true` — Spark 4's
  * DEFAULT. The Verify gate pins ANSI off for reference parity (Spark
  * 3.0-era lenient casts, SURVEY.md §7 hard part #3), but a user embedding
  * this library in a default-conf Spark 4 session gets ANSI semantics; this
  * spec proves every gate query still runs green there AND returns the
  * identical result, except for the explicitly pinned queries whose
  * 3.0-parity semantics are load-bearing (each documented below). */
class AnsiSweepSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries NOT swept under ANSI, each with the documented reason — the
    * lenient behavior is the operator's contract, not an accident. */
  private val pinned: Map[String, String] = Map(
    // (filled as the sweep finds genuine 3.0-parity dependencies)
  )

  private def canon(df: org.apache.spark.sql.DataFrame): String =
    df.collect().map(_.toString).sorted.mkString("\n")

  test("every gate query is green and result-identical under ANSI mode") {
    val on = org.apache.spark.sql.graft.PlanShim.cloneSession(spark)
    on.conf.set("spark.sql.ansi.enabled", "true")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.allQueries.sortBy(_.name).foreach { q =>
      if (!pinned.contains(q.name)) {
        try {
          val base = canon(q.run(spark, dir))
          val got = canon(q.run(on, dir))
          if (got != base)
            failures += s"${q.name}: ANSI-on result differs from ANSI-off"
        } catch { case e: Throwable =>
          failures += s"${q.name}: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)
        }
        spark.sharedState.cacheManager.clearCache()
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} quer(ies) broke under ANSI:\n${failures.mkString("\n")}")
  }
}
