package graft.queries

import graft.SparkSpec
import graft.dedup.SignatureStore
import graft.table.VersionedTable
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Sequential-consistency property for the incremental dedup store: for
  * ANY sequence of admission batches over a pool of texts (duplicates
  * across batches guaranteed by a small pool), every document's verdict
  * equals the reference model — admitted iff its text was unseen in the
  * corpus plus every EARLIER admission (first writer of a text wins, the
  * store remembers it forever), `dup_of` = the minimum doc_id ever
  * admitted with that exact text — and the store grows by exactly the
  * admitted documents. Texts are built word-disjoint so cross-text
  * near-dup never fires and the model stays exact-match (the lane math is
  * pinned separately by the d12 DuckDB oracle and DedupIndexSpec). */
object DedupIndexProps extends Properties("DedupIndex") with SparkSpec {
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  // word-disjoint text pool: equal texts are exact dups, different texts
  // share no 3-gram shingles (no near-dup candidates at all)
  private val pool: Vector[String] = Vector.tabulate(5)(i =>
    (0 until 8).map(j => s"w${i}_$j").mkString(" "))

  private val batchesGen: Gen[List[List[Int]]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 4).flatMap(m =>
        Gen.listOfN(m, Gen.chooseNum(0, pool.size - 1)))))

  property("any batch sequence: first writer wins, store = corpus + admitted") =
    Prop.forAll(batchesGen) { batches =>
      val root = tmpDir("dip-") + "/ix"
      // corpus: texts 0 and 1, ids 1 and 2
      SignatureStore.build(spark, root,
        Seq((1L, pool(0)), (2L, pool(1))).toDF("doc_id", "text"))
      var holder = Map(pool(0) -> 1L, pool(1) -> 2L) // text -> min admitted id
      var storeRows = 2L
      var nextId = 10L
      val ok = batches.forall { picks =>
        // distinct texts per batch (within-batch dups are the caller's
        // concern by contract); ids strictly increasing across batches
        val docs = picks.distinct.map { i =>
          val id = nextId; nextId += 1; (id, pool(i))
        }
        val d = SignatureStore.admit(spark, root,
            docs.toDF("doc_id", "text"))
          .collect().map(r => r.getLong(0) ->
            (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
        val batchOk = docs.forall { case (id, text) =>
          holder.get(text) match {
            case Some(owner) => d(id) == (("exact_dup", Some(owner)))
            case None => d(id) == (("admitted", None))
          }
        }
        docs.foreach { case (id, text) =>
          if (!holder.contains(text)) { holder += text -> id; storeRows += 1 }
        }
        batchOk && VersionedTable(s"$root/sigs").read(spark).count() == storeRows
      }
      ok
    }
}
