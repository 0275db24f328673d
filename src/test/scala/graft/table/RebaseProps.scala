package graft.table

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}

import java.nio.file.Path
import java.util.concurrent.atomic.AtomicBoolean

/** Serializability property for the whole rebase lattice
  * ([[VersionedTable.publishRewrite]]): for a RANDOM main verb racing a
  * RANDOM interloper verb (fired deterministically at the main verb's
  * first manifest put), the outcome must be one of exactly two things —
  *
  *  1. both commits land and the final rows equal applying the two verbs
  *     to the initial state in SOME serial order, or
  *  2. [[ConcurrentCommitException]] surfaces, nothing of the main verb
  *     landed, and re-running it against the new head yields the serial
  *     interloper-then-main result.
  *
  * Anything else — a silently dropped interloper, a half-applied main
  * verb, a fold that matches NO serial order — falsifies the property.
  * Verbs span every rebase classification: appends (fold), COW deletes /
  * updates (rewrites: partition-disjoint fold or raise), MOR deletes
  * (pure DV addition: file-disjoint fold or raise), partition-scoped
  * compactions (row-preserving rewrites), and dynamic partition
  * overwrites (partition-set rewrites). The reference model is a plain
  * row multiset; compaction is its identity. */
object RebaseProps extends Properties("Rebase") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private type Row3 = (Long, String, Double)
  private val initial: Seq[Row3] = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
    (4L, "b", 40.0), (5L, "b", 50.0), (6L, "b", 60.0))

  private sealed trait Op
  private case class Append(id: Long, p: String) extends Op
  private case class CowDelete(lo: Long, hi: Long) extends Op
  private case class MorDelete(lo: Long, hi: Long) extends Op
  private case class Update(lo: Long, hi: Long, delta: Double) extends Op
  private case class CompactPart(p: String) extends Op
  private case class OverwritePart(p: String, id: Long) extends Op

  private val partGen = Gen.oneOf("a", "b")
  private val rangeGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(1L, 6L); b <- Gen.chooseNum(1L, 6L)
  } yield (math.min(a, b), math.max(a, b))

  private val opGen: Gen[Op] = Gen.frequency(
    2 -> (for { id <- Gen.chooseNum(10L, 99L); p <- partGen } yield Append(id, p)),
    2 -> rangeGen.map { case (l, h) => CowDelete(l, h) },
    2 -> rangeGen.map { case (l, h) => MorDelete(l, h) },
    2 -> (for { (l, h) <- rangeGen; d <- Gen.chooseNum(1, 9) }
      yield Update(l, h, d.toDouble)),
    1 -> partGen.map(CompactPart),
    1 -> (for { p <- partGen; id <- Gen.chooseNum(100L, 199L) }
      yield OverwritePart(p, id)))

  /** The op's effect on the reference multiset (compaction = identity). */
  private def apply(ref: Seq[Row3], op: Op): Seq[Row3] = op match {
    case Append(id, p) => ref :+ ((id, p, id.toDouble))
    case CowDelete(l, h) => ref.filterNot(r => r._1 >= l && r._1 <= h)
    case MorDelete(l, h) => ref.filterNot(r => r._1 >= l && r._1 <= h)
    case Update(l, h, d) => ref.map(r =>
      if (r._1 >= l && r._1 <= h) (r._1, r._2, r._3 + d) else r)
    case CompactPart(_) => ref
    case OverwritePart(p, id) =>
      ref.filterNot(_._2 == p) :+ ((id, p, 999.0))
  }

  /** Run the op through the table API. */
  private def run(t: VersionedTable, op: Op): Unit = op match {
    case Append(id, p) => t.append(Seq((id, p, id.toDouble)).toDF("id", "k", "amt"))
    case CowDelete(l, h) => t.delete(spark, s"id BETWEEN $l AND $h")
    case MorDelete(l, h) => t.deleteMor(spark, s"id BETWEEN $l AND $h")
    case Update(l, h, d) => t.update(spark, s"id BETWEEN $l AND $h",
      Map("amt" -> s"amt + $d"))
    case CompactPart(p) => t.compactWhere(spark, s"k = '$p'")
    case OverwritePart(p, id) =>
      t.overwritePartitions(Seq((id, p, 999.0)).toDF("id", "k", "amt"))
  }

  private final class FireOnce(interlope: () => Unit) extends CommitStore {
    private val fired = new AtomicBoolean(false)
    override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
      if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
          fired.compareAndSet(false, true)) interlope()
      LinkCommitStore.putIfAbsent(target, bytes)
    }
  }

  private def rows(root: String): Seq[Row3] =
    VersionedTable(root).read(spark).selectExpr("id", "k", "amt")
      .as[Row3].collect().sorted.toSeq

  property("racing random verbs: serial-order result or clean conflict + recovery") =
    Prop.forAll(opGen, opGen) { (main, interloper) =>
      val root = tmpDir("rbp-") + "/t"
      VersionedTable(root).commit(initial.toDF("id", "k", "amt"),
        partitionBy = Seq("k"))
      val t = new VersionedTable(root, new FireOnce(() =>
        run(VersionedTable(root), interloper)))
      val mainThenInter = apply(apply(initial, main), interloper).sorted
      val interThenMain = apply(apply(initial, interloper), main).sorted
      try {
        run(t, main)
        val got = rows(root)
        Prop(got == mainThenInter || got == interThenMain) :|
          s"folded main=$main interloper=$interloper got=$got " +
            s"expected one of $mainThenInter / $interThenMain"
      } catch {
        case _: ConcurrentCommitException =>
          // conflict path: the interloper's commit must be intact, and the
          // standard recovery (re-run against the new head) must land the
          // serial interloper-then-main state
          val before = rows(root)
          val interOnly = apply(initial, interloper).sorted
          run(VersionedTable(root), main)
          val got = rows(root)
          Prop(before == interOnly && got == interThenMain) :|
            s"conflict main=$main interloper=$interloper " +
              s"before=$before (want $interOnly) got=$got (want $interThenMain)"
      }
    }
}
