package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Column-level library helpers to the SQL-string formulations the
  * oracle queries use, so the two can't drift (the helpers are the public
  * API face; the queries inline SQL text for oracle symmetry). */
class VectorFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("wordShingles matches the dedup queries' SQL shingle expression") {
    val mismatches = docs
      .withColumn("a", TextFunctions.wordShingles(col("text"), 3))
      .withColumn("b", expr(graft.SparkSpec.ShingleSql))
      .filter($"a" =!= $"b").count()
    assert(mismatches === 0)
  }

  test("jaccard helper matches the intersect/union SQL formulation") {
    val pairs = docs.limit(20).select($"doc_id".as("a_id"),
        TextFunctions.wordShingles($"text", 3).as("sa"))
      .crossJoin(docs.limit(20).select($"doc_id".as("b_id"),
        TextFunctions.wordShingles($"text", 3).as("sb")))
      .filter($"a_id" < $"b_id")
    val mismatches = pairs
      .withColumn("a", TextFunctions.jaccard($"sa", $"sb"))
      .withColumn("b", expr(
        """CAST(size(array_intersect(array_distinct(sa), array_distinct(sb))) AS DOUBLE)
          | / (size(array_distinct(sa)) + size(array_distinct(sb))
          |    - size(array_intersect(array_distinct(sa), array_distinct(sb))))""".stripMargin))
      .filter($"a" =!= $"b").count()
    assert(mismatches === 0)
  }

  test("cosineSim6 equals cosineWithNorms6 with precomputed norms") {
    val e = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nv", VectorFunctions.l2Norm($"v"))
    val q = e.filter($"vec_id" === 0).select($"v".as("qv"), $"nv".as("nqv"))
    val mismatches = e.crossJoin(broadcast(q))
      .withColumn("a", VectorFunctions.cosineSim6($"v", $"qv"))
      .withColumn("b", VectorFunctions.cosineWithNorms6($"v", $"nv", $"qv", $"nqv"))
      .filter($"a" =!= $"b").count()
    assert(mismatches === 0)
  }

  test("whitespaceTokens drops empty tokens on messy spacing") {
    val out = Seq("  a  b c ", "", "x").toDF("t")
      .select(TextFunctions.whitespaceTokens($"t").as("tk"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a", "b", "c"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq("x"))
  }
}
