package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MediaDecodeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("mapPartitions decode plumbing produces one features row per payload") {
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val payloads = docs.selectExpr("doc_id", "CAST(text AS BINARY) AS payload")
      .as[(Long, Array[Byte])]
    val feats = MediaDecode.decodeFeatures(payloads)
    val n = docs.count()
    assert(feats.count() === n)
    val row = feats.filter(_.doc_id == 0L).collect().head
    assert(row.n_bytes > 0)
    assert(Set("imgA", "imgB").contains(row.format))
    assert(row.mean_byte > 0 && row.mean_byte < 256)
    assert(row.n_frames_sampled === (row.n_bytes + 63) / 64)
    // deterministic: re-run yields identical rows
    assert(MediaDecode.decodeFeatures(payloads).exceptAll(feats).count() === 0)
  }

  test("resize keeps every stride-th byte through the batch path") {
    val payloads = Seq((1L, "abcdefghij".getBytes("UTF-8")), (2L, Array.empty[Byte]))
      .toDS()
    val out = MediaDecode.resize(payloads, stride = 4).collect().toMap
    assert(new String(out(1L), "UTF-8") === "aei")
    assert(out(2L).isEmpty)
  }

  test("media columns attach opaque payload + queryable metadata struct") {
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val out = MediaDecode.withMediaColumns(docs, "text")
    assert(out.schema("payload").dataType.typeName === "binary")
    val meta = out.selectExpr("media_meta.format", "media_meta.n_bytes", "n_chars")
      .as[(String, Int, Long)].collect()
    assert(meta.forall { case (f, nb, nc) => f == "txt" && nb == nc })
  }
}
