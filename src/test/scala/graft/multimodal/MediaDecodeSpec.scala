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

  test("embed: strided byte sums centered by the uniform share") {
    // 130 bytes of 'a' (97): dims 0,1 get three positions, dims 2..63 two —
    // sums {291, 291, 194×62}; centre = 12610/64 = 197.03125 exactly
    // (power-of-two division), so the centered dims are signed
    val v = MediaDecode.FakeCodec.embed(Array.fill(130)('a'.toByte))
    assert(v.length === 64)
    val centre = 130.0 * 97 / 64
    assert(v(0) === 3 * 97 - centre && v(1) === 3 * 97 - centre)
    assert((2 until 64).forall(i => v(i) === 2 * 97 - centre))
    // signed: the long dims sit above the share, the short ones below
    assert(v(0) > 0 && v(63) < 0)
    // the dataset path emits (id, probed format, embedding) per payload
    val out = MediaDecode.embed(
      Seq((7L, "abcd".getBytes("UTF-8"))).toDS()).collect().head
    assert(out._1 === 7L && out._2 === "imgB")
    assert(out._3.toSeq === MediaDecode.FakeCodec.embed("abcd".getBytes("UTF-8")).toSeq)
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
