package graft.etl

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Real-JDBC stage coverage against embedded Derby (`derby-10.16` ships on
  * the Spark classpath): [[JDBCExecute]] runs multi-statement DDL scripts
  * driver-side, [[JDBCExtract]] plans range-partitioned parallel reads with
  * auto-probed bounds, [[JDBCLoad]] writes back through Spark's JDBC sink.
  * The reference's `JDBCExecute` crosses to Athena the same way
  * (scd2-job.ipynb:373-384) — an endpoint URL plus a `.sql` script. */
class JdbcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // keep derby.log out of the repo working dir
  System.setProperty("derby.system.home", tmpDir("derby-home-"))

  private def freshUrl(): String =
    s"jdbc:derby:memory:g${java.util.UUID.randomUUID().toString.replace("-", "")};create=true"

  test("splitStatements honors quotes and line comments") {
    assert(Jdbc.splitStatements("CREATE TABLE t (x INT); INSERT INTO t VALUES (1)")
      === Seq("CREATE TABLE t (x INT)", "INSERT INTO t VALUES (1)"))
    assert(Jdbc.splitStatements("INSERT INTO t VALUES ('a;b'); -- done; really\nDROP TABLE t")
      === Seq("INSERT INTO t VALUES ('a;b')", "-- done; really\nDROP TABLE t"))
    assert(Jdbc.splitStatements("SELECT 1;;;") === Seq("SELECT 1"))
    assert(Jdbc.splitStatements("""INSERT INTO "a;c" VALUES ('it''s; fine')""")
      === Seq("""INSERT INTO "a;c" VALUES ('it''s; fine')"""))
  }

  test("JDBCExecute runs a multi-statement script with sqlParams on the endpoint") {
    val url = freshUrl()
    JDBCExecute("ddl", url,
      sql = """CREATE TABLE app.contact (id INT, state VARCHAR(2));
              |INSERT INTO app.contact VALUES (1, '${home}');
              |INSERT INTO app.contact VALUES (2, 'NY')""".stripMargin,
      sqlParams = Map("home" -> "WA")).execute(spark, Map.empty)
    val n = Jdbc.withConnection(url) { conn =>
      val rs = conn.createStatement()
        .executeQuery("SELECT COUNT(*) FROM app.contact WHERE state = 'WA'")
      rs.next(); rs.getInt(1)
    }
    assert(n === 1)
  }

  test("JDBCExtract auto-probes bounds and plans a partitioned parallel read") {
    val url = freshUrl()
    val ddl = (1 to 97).map(i => s"INSERT INTO t (id, v) VALUES ($i, ${i * 10})")
      .mkString("CREATE TABLE t (id BIGINT, v INT);", ";", "")
    JDBCExecute("seed", url, ddl).execute(spark, Map.empty)
    val df = JDBCExtract("read", url, "t", "jdbc_t",
      partitionColumn = Some("id"), numPartitions = Some(4))
      .execute(spark, Map.empty).get
    // bounds probed MIN=1 MAX=97 → 4 range-disjoint slices, no driver funnel
    assert(df.rdd.getNumPartitions === 4)
    assert(spark.table("jdbc_t").count() === 97)
    assert(spark.table("jdbc_t").agg(org.apache.spark.sql.functions.sum("v"))
      .head.getLong(0) === (1 to 97).map(_ * 10L).sum)
  }

  test("JDBCLoad writes a view and JDBCExtract round-trips it") {
    val url = freshUrl()
    Seq((1L, "F", 10.5), (2L, "O", 20.0), (3L, "F", 7.25))
      .toDF("k", "flag", "price").createOrReplaceTempView("to_jdbc")
    JDBCLoad("load", "to_jdbc", url, "roundtrip", numPartitions = Some(1))
      .execute(spark, Map.empty)
    val back = JDBCExtract("back", url, "roundtrip", "from_jdbc")
      .execute(spark, Map.empty).get
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq === Seq((1L, "F", 10.5), (2L, "O", 20.0), (3L, "F", 7.25)))
  }

  test("the parser builds real JDBC stages when a jdbcURL is present") {
    val spec = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "JDBCExecute", "name": "ddl", "jdbcURL": "jdbc:derby:memory:x",
        |   "sql": "VALUES 1", "sqlParams": {"a": "b"}},
        |  {"type": "JDBCExecute", "name": "cat", "inputURI": "/x.sql"},
        |  {"type": "JDBCExtract", "name": "e", "jdbcURL": "u", "tableName": "t",
        |   "outputView": "v", "partitionColumn": "id", "numPartitions": 8,
        |   "lowerBound": "0", "upperBound": "1000", "fetchsize": 500},
        |  {"type": "JDBCLoad", "name": "l", "inputView": "v", "jdbcURL": "u",
        |   "tableName": "t", "saveMode": "Overwrite", "truncate": true}
        |]}""".stripMargin)
    assert(spec.stages(0) ===
      JDBCExecute("ddl", "jdbc:derby:memory:x", "VALUES 1", Map("a" -> "b")))
    // no jdbcURL → the self-contained session-catalog mapping, as before
    assert(spec.stages(1) === SQLExecute("cat", "", Map.empty, Some("/x.sql")))
    assert(spec.stages(2) === JDBCExtract("e", "u", "t", "v", Some("id"), Some(8),
      Some(0L), Some(1000L), Nil, 500))
    assert(spec.stages(3) === JDBCLoad("l", "v", "u", "t", "Overwrite", None, 1000, true))
  }
}
