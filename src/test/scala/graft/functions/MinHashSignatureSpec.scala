package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashSignatureSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val foldSig =
    """aggregate(sh, array_repeat('g', 16), (acc, s) ->
      |  aggregate(array(concat(md5(concat('0:', s)), md5(concat('1:', s)),
      |                         md5(concat('2:', s)), md5(concat('3:', s)))), acc,
      |    (a2, h) -> zip_with(a2, sequence(0, 15),
      |      (m, i) -> least(m, substr(h, CAST(1 + i * 8 AS INT), 8)))))""".stripMargin

  private def register(): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSignature(exprs.head), "scala_udf")

  test("native expression is bit-identical to the SQL higher-order fold") {
    register()
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), expr(graft.SparkSpec.ShingleSql).as("sh"))
    val mismatches = docs
      .withColumn("a", expr("minhash_sig(sh)"))
      .withColumn("b", expr(foldSig))
      .filter(expr("a <> b"))
      .count()
    assert(mismatches === 0)
  }

  test("rolling_min_hash is bit-identical to the SQL gram-fold") {
    GraftFunctions.registerAll(spark)
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val mismatches = docs
      .withColumn("a", expr("rolling_min_hash(text, 8)"))
      .withColumn("b", expr(
        """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
          |  i -> substr(md5(substr(text, i, 8)), 1, 16)))""".stripMargin))
      .filter(expr("a <> b"))
      .count()
    assert(mismatches === 0)
  }

  test("minhash_agg over single-row groups equals the per-row expression") {
    GraftFunctions.registerAll(spark)
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), expr(graft.SparkSpec.ShingleSql).as("sh"))
    docs.createOrReplaceTempView("mha_docs")
    // group of one doc → aggregate signature must equal the row signature
    val mismatches = spark.sql(
      """SELECT doc_id, minhash_agg(sh) AS a, first(minhash_sig(sh)) AS b
        |FROM mha_docs GROUP BY doc_id""".stripMargin)
      .filter(expr("a <> b")).count()
    assert(mismatches === 0)
  }

  test("minhash_agg is partition-order invariant (partial agg + merge)") {
    GraftFunctions.registerAll(spark)
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), expr(graft.SparkSpec.ShingleSql).as("sh"))
    def sigs(df: org.apache.spark.sql.DataFrame) = {
      df.createOrReplaceTempView("mha_src")
      spark.sql("SELECT source, minhash_agg(sh) AS sig FROM mha_src GROUP BY source")
        .as[(String, Seq[String])].collect().toMap
    }
    val a = sigs(docs.repartition(1))
    val b = sigs(docs.repartition(13))
    assert(a === b)
  }

  test("empty shingle array yields the fold's 'g' identity") {
    register()
    val out = Seq(Seq.empty[String]).toDF("sh")
      .select(expr("minhash_sig(sh)")).as[Seq[String]].collect().head
    assert(out === Seq.fill(16)("g"))
  }

  test("signature lanes are 8-char lowercase hex, stable across runs") {
    register()
    val out = Seq(Seq("alpha beta gamma", "beta gamma delta")).toDF("sh")
      .select(expr("minhash_sig(sh)")).as[Seq[String]].collect().head
    assert(out.size === 16)
    assert(out.forall(_.matches("[0-9a-f]{8}")))
    val again = Seq(Seq("alpha beta gamma", "beta gamma delta")).toDF("sh")
      .select(expr("minhash_sig(sh)")).as[Seq[String]].collect().head
    assert(again === out)
  }
}
