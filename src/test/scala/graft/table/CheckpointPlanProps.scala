package graft.table

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Soundness property for checkpoint-planned rewrite candidates
  * ([[VersionedTable.checkpointPlanCandidates]]): for ANY predicate the
  * planner might derive bounds from — numeric, string, temporal, matched
  * or MISmatched literal category, in or out of the data range — a DELETE
  * on a CHECKPOINTED table must drop exactly the rows the same delete
  * drops on an identical un-checkpointed table (which plans from the full
  * manifest list). A planner that wrongly pruned a candidate file would
  * make the checkpointed delete silently keep rows; equality across a
  * random predicate stream proves every derived bound is conservative.
  *
  * The generators deliberately include the traps the code guards against:
  * numeric literals against the string column (SQL coerces to DOUBLE, the
  * stats compare lexicographically — '100' < '20'), numeric-string
  * literals against the numeric column, DATE literals against the
  * TIMESTAMP column (no sound rendering → must contribute no bound), and
  * string-timestamp literals that parse through Spark's cast semantics.
  * The string column's values are numeric strings whose LEXICOGRAPHIC
  * file ranges overlap heavily ("9" > "399"), so an unsound string bound
  * would prune a live file almost immediately. */
object CheckpointPlanProps extends Properties("CheckpointPlan") with SparkSpec {
  import spark.implicits._

  // each case runs checkpoint + two deletes + two restores (~seconds)
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val (plain, ckptd) = {
    val base = tmpDir("ckpp-")
    // ns: null on a key RANGE, so the k-sorted files split into all-null,
    // mixed, and zero-null — the three shapes nullCount pruning must
    // distinguish (IS NULL may skip the zero-null files, IS NOT NULL the
    // all-null ones, and the mixed file must always survive both)
    val df = spark.range(0, 400).selectExpr(
      "id AS k",
      "CAST(id AS STRING) AS s",
      "timestamp_seconds(1600000000 + id * 3600) AS ts",
      "CASE WHEN id < 120 THEN NULL ELSE CAST(id AS STRING) END AS ns",
      // nested struct: a string leaf with the same lexicographic trap as s,
      // a numeric leaf, and a range-null leaf — the round-15 nested-stats
      // surface (collectFileStats keys struct leaves by dotted path)
      "named_struct('fmt', CAST(id AS STRING), 'b', id * 2, " +
        "'nf', CASE WHEN id >= 280 THEN NULL ELSE CAST(id AS STRING) END) AS meta")
    val p = VersionedTable(base + "/plain")
    val c = VersionedTable(base + "/ckptd")
    Seq(p, c).foreach(_.commit(df, numPartitions = Some(8), sortBy = Seq("k")))
    (p, c)
  }

  private val opGen: Gen[String] = Gen.oneOf("<", "<=", ">", ">=", "=")

  private val kAtom: Gen[String] = for {
    op <- opGen
    v <- Gen.chooseNum(-50L, 450L)
    lit <- Gen.oneOf(v.toString, s"'$v'", s"${v}.5") // numeric / string / decimal
  } yield s"k $op $lit"

  private val sAtom: Gen[String] = for {
    op <- opGen
    v <- Gen.chooseNum(0L, 400L)
    // quoted string = same-category lexicographic bound; bare number =
    // cross-category DOUBLE coercion the planner must refuse to bound
    lit <- Gen.oneOf(s"'$v'", v.toString)
  } yield s"s $op $lit"

  private val tsAtom: Gen[String] = for {
    op <- opGen
    day <- Gen.chooseNum(10, 32) // data spans Sep 13-30; include out-of-range
    hour <- Gen.chooseNum(0, 23)
    ds = f"2020-09-${math.min(day, 30)}%02d"
    hs = f"$hour%02d"
    lit <- Gen.oneOf(
      s"TIMESTAMP '$ds $hs:00:00'",
      s"'$ds $hs:00:00'",
      s"DATE '$ds'") // date-vs-timestamp: must contribute NO bound
  } yield s"ts $op $lit"

  // nullness conjuncts: the range-null column both ways, plus the
  // never-null column (its IS NULL may prune EVERY file — the planned
  // delete must then touch zero rows, same as the manifest-planned one)
  private val nullAtom: Gen[String] = Gen.oneOf(
    "ns IS NULL", "ns IS NOT NULL", "s IS NULL", "s IS NOT NULL",
    "meta.nf IS NULL", "meta.nf IS NOT NULL")

  // nested struct leaves, both literal categories (the mismatched one must
  // contribute no bound, exactly as for the top-level columns)
  private val nestedAtom: Gen[String] = for {
    op <- opGen
    v <- Gen.chooseNum(0L, 400L)
    c <- Gen.oneOf("meta.fmt", "meta.b")
    lit <- Gen.oneOf(s"'$v'", v.toString)
  } yield s"$c $op $lit"

  private val predGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 2)
    atoms <- Gen.listOfN(n, Gen.oneOf(kAtom, sAtom, tsAtom, nullAtom, nestedAtom))
  } yield atoms.mkString(" AND ")

  property("checkpointed DELETE ≡ manifest-planned DELETE for random predicates") =
    Prop.forAll(predGen) { pred =>
      ckptd.checkpoint(spark)
      val (_, n1) = plain.delete(spark, pred)
      val (_, n2) = ckptd.delete(spark, pred)
      val a = plain.read(spark).selectExpr("k").as[Long].collect().sorted.toSeq
      val b = ckptd.read(spark).selectExpr("k").as[Long].collect().sorted.toSeq
      // roll both back so every case starts from the identical snapshot
      plain.restore(0L)
      ckptd.restore(0L)
      Prop(n1 == n2 && a == b) :|
        s"pred='$pred' touched plain=$n1 ckptd=$n2 rows plain=${a.size} ckptd=${b.size}"
    }
}
