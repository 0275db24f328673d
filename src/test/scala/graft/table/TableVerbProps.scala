package graft.table

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Stateful property test for the versioned table's incremental verbs: a
  * random sequence of append / update / delete operations applied through
  * the copy-on-write machinery must land on exactly the state a trivial
  * in-memory reference implementation computes, must create exactly one
  * version per state-changing operation (no-op verbs commit nothing), and
  * every version must stay time-travelable to its own snapshot. */
object TableVerbProps extends Properties("TableVerbs") with SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case class Append(rows: Seq[(Long, Long)]) extends Op
  private case class Update(loKey: Long, hiKey: Long, delta: Long) extends Op
  private case class Delete(loKey: Long, hiKey: Long) extends Op
  private case class MorDelete(loKey: Long, hiKey: Long) extends Op

  private val appendGen: Gen[Op] = for {
    n <- Gen.chooseNum(1, 12)
    ks <- Gen.listOfN(n, Gen.chooseNum(0L, 400L))
    v <- Gen.chooseNum(0L, 9L)
  } yield Append(ks.distinct.map(k => k -> (k % 10 + v)))

  private val rangeGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, 400L)
    b <- Gen.chooseNum(0L, 400L)
  } yield (math.min(a, b), math.max(a, b))

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> appendGen,
    2 -> rangeGen.flatMap { case (l, h) =>
      Gen.chooseNum(1L, 50L).map(Update(l, h, _)) },
    2 -> rangeGen.map { case (l, h) => Delete(l, h) },
    2 -> rangeGen.map { case (l, h) => MorDelete(l, h) })

  property("random verb sequences match the in-memory reference; versions = state changes") =
    Prop.forAll(Gen.listOfN(5, opGen)) { ops =>
      val root = tmpDir("props-")
      val t = VersionedTable(root)
      val initial = Seq(10L -> 1L, 20L -> 2L, 300L -> 3L)
      t.append(initial.toDF("id", "v"))
      // reference: multiset of (id, v); appends may duplicate ids
      var ref = initial.toVector
      var expected = Vector(ref.sorted) // snapshot per committed version
      ops.foreach { op =>
        val before = ref
        op match {
          case Append(rows) =>
            t.append(rows.toDF("id", "v"))
            ref = ref ++ rows
          case Update(lo, hi, d) =>
            t.update(spark, s"id BETWEEN $lo AND $hi", Map("v" -> s"v + $d"))
            ref = ref.map { case (k, v) =>
              if (k >= lo && k <= hi) (k, v + d) else (k, v) }
          case Delete(lo, hi) =>
            t.delete(spark, s"id BETWEEN $lo AND $hi")
            ref = ref.filterNot { case (k, _) => k >= lo && k <= hi }
          case MorDelete(lo, hi) =>
            // merge-on-read: same observable semantics as Delete, but via
            // deletion-vector tombstones — zero data files rewritten
            t.deleteMor(spark, s"id BETWEEN $lo AND $hi")
            ref = ref.filterNot { case (k, _) => k >= lo && k <= hi }
        }
        if (ref != before) expected = expected :+ ref.sorted
      }
      val got = t.read(spark).as[(Long, Long)].collect().toVector.sorted
      val stateOk = got == ref.sorted
      val vs = t.versions()
      val countOk = vs.size == expected.size
      val travelOk = countOk && vs.zip(expected).forall { case (ver, snap) =>
        t.read(spark, versionAsOf = Some(ver)).as[(Long, Long)]
          .collect().toVector.sorted == snap
      }
      // compaction must materialize any outstanding tombstones and
      // preserve the final state bit-for-bit
      t.compact(spark, numFiles = 2)
      val afterCompact = t.read(spark).as[(Long, Long)].collect().toVector.sorted
      stateOk && countOk && travelOk && afterCompact == ref.sorted
    }
}
