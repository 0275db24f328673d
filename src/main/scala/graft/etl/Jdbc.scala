package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Real JDBC stages — the external-endpoint side of the reference's data
  * plane (`JDBCExecute` ships Athena DDL at scd2-job.ipynb:373-384; the
  * engine's self-contained mapping of that stage to the session catalog
  * lives in [[SQLExecute]] and remains the default when no `jdbcURL` is
  * given).
  *
  * Scale notes:
  *  - [[JDBCExecute]] is DRIVER-side by design — it is control-plane DDL
  *    (register a partition, create an external table), one connection,
  *    no data motion.
  *  - [[JDBCExtract]] reads PARALLEL when `partitionColumn` is set: Spark
  *    issues one range-predicated query per partition so 1000 executors
  *    pull disjoint slices; bounds are auto-derived with a driver-side
  *    MIN/MAX probe when not supplied (one tiny query, never a scan
  *    through the JVM driver).
  *  - [[JDBCLoad]] writes from executors in `batchsize`d inserts;
  *    `numPartitions` caps the connection count so a 1000-task stage
  *    cannot open 1000 simultaneous connections against the endpoint.
  */
object Jdbc {
  /** Split a DDL script into individual statements on top-level `;`,
    * honoring single-quoted SQL strings (with `''` escapes) and
    * double-quoted identifiers — JDBC `Statement.execute` takes one
    * statement at a time, while the reference's `.sql` objects are
    * scripts (scd2-job.ipynb:381). */
  private[etl] def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur += c
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          // line comment: copy to EOL so a `;` inside it can't split
          val eol = script.indexOf('\n', i)
          val end = if (eol < 0) script.length else eol
          cur ++= script.substring(i, end); i = end - 1
        case ';' => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def withConnection[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** MIN/MAX of `colName` over `table` for partition-bound probing. Tried
    * unquoted first (matches tables whose identifiers were created unquoted
    * and case-folded), then double-quoted (matches Spark's JDBC writer,
    * which quotes column names verbatim via the dialect) — covers both
    * identifier regimes without knowing which created the table. */
  private[etl] def probeBounds(url: String, table: String, colName: String): (Long, Long) =
    withConnection(url) { conn =>
      def run(c: String): (Long, Long) = {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT MIN($c), MAX($c) FROM $table t")
          rs.next()
          (rs.getLong(1), rs.getLong(2))
        } finally st.close()
      }
      try run(colName)
      catch { case _: java.sql.SQLException => run("\"" + colName + "\"") }
    }
}
