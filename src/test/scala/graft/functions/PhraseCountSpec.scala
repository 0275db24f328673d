package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.hashing.MurmurHash3

class PhraseCountSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** The exact HOF formulation s19 used before the native expression. */
  private val hofCount = expr(
    """CAST(CASE WHEN size(toks) >= size(ptoks)
      |  THEN size(filter(sequence(1, size(toks) - size(ptoks) + 1),
      |       i -> toks[i - 1] = ptoks[0]
      |            AND slice(toks, i, size(ptoks)) = ptoks))
      |  ELSE 0 END AS BIGINT)""".stripMargin)

  test("phrase_count is bit-equal to the HOF slide it replaces") {
    GraftFunctions.registerAll(spark)
    // deterministic pseudo-random corpus over a tiny vocabulary so matches,
    // overlaps, and head-only near-misses all actually occur
    val vocab = Array("a", "b", "c", "ab", "d")
    def tok(seed: Int, i: Int): String =
      vocab(math.abs(MurmurHash3.productHash((seed, i))) % vocab.length)
    val rows = for {
      seed <- 0 until 60
      m <- 1 to 3
    } yield (
      Array.tabulate(5 + seed % 40)(i => tok(seed, i)),
      Array.tabulate(m)(i => tok(seed * 7 + 13, i)))
    val df = rows.toDF("toks", "ptoks")
    val out = df.select(
      expr("phrase_count(toks, ptoks)").as("native"),
      hofCount.as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // the corpus must exercise both outcomes or the test proves nothing
    assert(out.exists(_.getLong(0) > 0L) && out.exists(_.getLong(0) === 0L))
  }

  test("null-free edge shapes match the HOF: short doc, overlap, boundaries") {
    GraftFunctions.registerAll(spark)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a', 'b'), array('a', 'b', 'c')),      -- doc shorter than phrase: 0
        |  (array('a', 'a', 'a'), array('a', 'a')),      -- overlapping matches: 2
        |  (array('a', 'b'), array('a', 'b')),           -- phrase IS the doc: 1
        |  (array('x', 'a', 'b'), array('a', 'b')),      -- match flush at the end: 1
        |  (array('a', 'x', 'a', 'c'), array('a', 'b'))  -- head-only near misses: 0
        |AS t(toks, ptoks)""".stripMargin)
    val got = df.select(
      expr("phrase_count(toks, ptoks)").as("native"),
      hofCount.as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), s"mismatch: $r"))
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 2L, 1L, 1L, 0L))
  }

  test("native null semantics: NULL inputs, empty phrase, null element") {
    // the HOF's own null edges are ANSI-config-dependent (size(NULL) = -1
    // with ANSI off, slice length -1 throws) — the expression defines them
    GraftFunctions.registerAll(spark)
    val got = spark.sql(
      """SELECT phrase_count(toks, ptoks) AS c FROM VALUES
        |  (CAST(NULL AS ARRAY<STRING>), array('a')),
        |  (array('a'), CAST(NULL AS ARRAY<STRING>)),
        |  (array('x', 'y'), CAST(array() AS ARRAY<STRING>)),
        |  (array('a', CAST(NULL AS STRING), 'b'), array('a', 'b'))
        |AS t(toks, ptoks)""".stripMargin).collect()
    assert(got.map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq ===
      Seq(null, null, 0L, 0L))
  }

  test("lane_agree is bit-equal to the zip_with/IF fold it replaces") {
    GraftFunctions.registerAll(spark)
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
    def lane(seed: Int, i: Int): String =
      "h" + (math.abs(MurmurHash3.productHash((seed, i))) % 4)
    val rows = for (seed <- 0 until 80) yield (
      Array.tabulate(16)(i => lane(seed, i)),
      Array.tabulate(if (seed % 10 == 0) 12 else 16)(i => lane(seed + 3, i)))
    val out = rows.toDF("a", "b")
      .select(expr("lane_agree(a, b)").as("native"), hof.as("hof")).collect()
    out.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    assert(out.exists(_.getInt(0) > 0) && out.exists(_.getInt(0) < 16))
    // NULL array on either side → NULL, like zip_with
    val n = spark.sql(
      """SELECT lane_agree(CAST(NULL AS ARRAY<STRING>), array('x')) AS a,
        |       lane_agree(array('x'), CAST(NULL AS ARRAY<STRING>)) AS b,
        |       lane_agree(array('x', CAST(NULL AS STRING)),
        |                  array('x', CAST(NULL AS STRING))) AS c""".stripMargin).head()
    assert(n.isNullAt(0) && n.isNullAt(1) && n.getInt(2) === 1)
  }

  test("phrase_count stays inside whole-stage codegen") {
    GraftFunctions.registerAll(spark)
    // input must depend on the Range id — a literal projection would be
    // constant-folded at optimize time and leave nothing to codegen
    val df = spark.range(8)
      .selectExpr(
        "split(concat('a b a b w', CAST(id AS STRING)), ' ') AS toks",
        "array('a', 'b') AS ptoks")
      .select(expr("phrase_count(toks, ptoks)").as("tf"))
    assert(df.head().getLong(0) === 2L)
    val inSpan = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("phrase_count") => w
    }
    assert(inSpan.nonEmpty,
      s"expected phrase_count inside a codegen span in:\n${df.queryExecution.executedPlan}")
  }
}
