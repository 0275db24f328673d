package graft.table

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Stateful property test for partition evolution: a random interleaving of
  * SET PARTITIONED BY (including back-and-forth and to-unpartitioned),
  * appends, range deletes, and OPTIMIZE must always read back exactly the
  * rows a trivial in-memory reference holds — across however many layout
  * epochs the sequence leaves behind — and a partition-pruned read on the
  * CURRENT spec column must equal the reference filter (the conservative
  * legacy-epoch keep + row filter can cost I/O, never rows). */
object PartitionEvolutionProps extends Properties("PartitionEvolution") with SparkSpec {
  import spark.implicits._

  // each run commits ~10 versions; 15 sequences exercise every epoch-mix
  // shape in ~90 s without dominating the suite (the CheckpointPlanProps /
  // RebaseProps budget discipline)
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private sealed trait Op
  private case class Evolve(spec: Seq[String]) extends Op
  private case class Append(rows: Seq[(Long, String, String)]) extends Op
  private case class Delete(loKey: Long, hiKey: Long) extends Op
  private case object Optimize extends Op

  private val regions = Seq("eu", "us", "ap")
  private val cats = Seq("a", "b")

  private val appendGen: Gen[Op] = for {
    n <- Gen.chooseNum(1, 8)
    ks <- Gen.listOfN(n, Gen.chooseNum(0L, 300L))
  } yield Append(ks.distinct.map(k =>
    (k, regions((k % 3).toInt), cats((k % 2).toInt))))

  private val evolveGen: Gen[Op] = Gen.oneOf(
    Evolve(Seq("region")), Evolve(Seq("cat")),
    Evolve(Seq("region", "cat")), Evolve(Nil))

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> appendGen,
    2 -> evolveGen,
    2 -> (for {
      a <- Gen.chooseNum(0L, 300L); b <- Gen.chooseNum(0L, 300L)
    } yield Delete(math.min(a, b), math.max(a, b))),
    1 -> Gen.const(Optimize))

  property("random evolve/append/delete/optimize sequences match the reference") =
    Prop.forAll(Gen.listOfN(5, opGen)) { ops =>
      val root = tmpDir("pep-")
      val t = VersionedTable(root)
      val initial = Seq((1L, "eu", "a"), (2L, "us", "b"), (3L, "ap", "a"))
      t.commit(initial.toDF("id", "region", "cat"),
        numPartitions = Some(1), partitionBy = Seq("region"))
      var ref = initial.toVector
      var spec: Seq[String] = Seq("region")
      ops.foreach {
        case Evolve(s) =>
          if (s != spec) { t.alterPartitioning(s); spec = s }
        case Append(rows) if rows.nonEmpty =>
          t.append(rows.toDF("id", "region", "cat"), numPartitions = Some(1))
          ref = ref ++ rows
        case Append(_) => ()
        case Delete(lo, hi) =>
          t.delete(spark, s"id BETWEEN $lo AND $hi")
          ref = ref.filterNot { case (k, _, _) => k >= lo && k <= hi }
        case Optimize =>
          t.compact(spark)
      }
      val got = t.read(spark).as[(Long, String, String)].collect().toVector.sorted
      val fullOk = got == ref.sorted
      // pruned read on the current spec's leading column (when partitioned):
      // rows must equal the reference filter regardless of epoch mix
      val prunedOk = spec.headOption.forall { c =>
        val want = spec.head match {
          case "region" => ref.filter(_._2 == "eu")
          case _ => ref.filter(_._3 == "a")
        }
        val value = if (c == "region") "eu" else "a"
        val (df, kept, total) = t.readPartitioned(spark, s"$c = '$value'")
        kept <= total &&
          df.as[(Long, String, String)].collect().toVector.sorted == want.sorted
      }
      // OPTIMIZE after everything un-mixes the layout completely
      t.compact(spark)
      val unmixed = !t.mixedLayoutOf(t.resolve())
      if (!(fullOk && prunedOk && unmixed))
        println(s"ops=$ops spec=$spec fullOk=$fullOk prunedOk=$prunedOk unmixed=$unmixed")
      fullOk && prunedOk && unmixed
    }
}
