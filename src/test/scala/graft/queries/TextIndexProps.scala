package graft.queries

import graft.SparkSpec
import graft.dedup.TextIndexStore
import graft.table.VersionedTable
import org.scalacheck.{Gen, Prop, Properties}

/** Stateful property for the BM25 store's maintenance contract: a RANDOM
  * sequence of admit/evict operations — overlapping batches, evictions of
  * absent ids, admits of already-indexed ids, down to and back up from an
  * empty surviving corpus — must leave the store BIT-IDENTICAL (postings,
  * lexicon, nd/totalLen) to a from-scratch build on exactly the surviving
  * id set. This is the "additive statistics" claim sealed under arbitrary
  * interleavings, not just the single admit/evict paths the example-based
  * specs walk: the double-admission guard and the df-decrement/deletion
  * logic must compose over any history. */
object TextIndexProps extends Properties("TextIndexStore") with SparkSpec {
  import spark.implicits._

  // each run builds two stores and replays ~4 maintenance ops — bound the
  // trial count the way CheckpointPlanProps does
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def docsFor(ids: Seq[Long]) =
    ids.toDF("doc_id").selectExpr("doc_id",
      "concat('spark merge sort dup w', doc_id % 17, ' window etl x', " +
        "doc_id % 5, ' y', doc_id % 3) AS text")

  private sealed trait Op
  private case class Admit(ids: Seq[Long]) extends Op
  private case class Evict(ids: Seq[Long]) extends Op

  private val idsGen: Gen[Seq[Long]] = for {
    n <- Gen.chooseNum(1, 15)
    ids <- Gen.listOfN(n, Gen.chooseNum(0L, 90L))
  } yield ids.distinct

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> idsGen.map(Admit),
    2 -> idsGen.map(Evict))

  private def lexRows(r: String): Seq[(String, Long)] =
    VersionedTable(s"$r/lexicon").read(spark)
      .selectExpr("word", "CAST(df AS BIGINT)").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq.sorted

  private def postRows(r: String): Seq[(Long, String, Long, Long)] =
    VersionedTable(s"$r/postings").read(spark)
      .selectExpr("doc_id", "word", "tf", "len").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .toSeq.sorted

  property("random admit/evict sequences ≡ a from-scratch build on the surviving ids") =
    Prop.forAll(Gen.listOfN(4, opGen)) { ops =>
      val root = tmpDir("tixprops-") + "/s"
      val initial = 0L until 30L
      TextIndexStore.build(spark, root, docsFor(initial), "fp")
      var present = initial.toSet
      var i = 0
      ops.foreach { op =>
        i += 1
        op match {
          case Admit(ids) =>
            // the guard drops already-present ids — the reference is a set
            val admitted = TextIndexStore.admit(spark, root, docsFor(ids), s"fp$i")
            val expected = (ids.toSet -- present).size.toLong
            require(admitted == expected,
              s"admit reported $admitted, expected $expected fresh of $ids")
            present ++= ids
          case Evict(ids) =>
            val evicted = TextIndexStore.evict(spark, root,
              docsFor(ids).select("doc_id"), s"fp$i")
            val expected = (ids.toSet & present).size.toLong
            require(evicted == expected,
              s"evict reported $evicted, expected $expected present of $ids")
            present --= ids
        }
      }
      if (present.isEmpty) {
        val (nd, tl) = TextIndexStore.stats(root)
        Prop(nd == 0L && tl == 0L &&
          VersionedTable(s"$root/postings").read(spark).isEmpty &&
          VersionedTable(s"$root/lexicon").read(spark).isEmpty) :| "emptied store"
      } else {
        val ref = tmpDir("tixprops-ref-") + "/s"
        TextIndexStore.build(spark, ref, docsFor(present.toSeq.sorted), "fpR")
        Prop(TextIndexStore.stats(root) == TextIndexStore.stats(ref)) :| "stats" &&
          Prop(lexRows(root) == lexRows(ref)) :| "lexicon" &&
          Prop(postRows(root) == postRows(ref)) :| "postings"
      }
    }
}
