package graft.queries

/** Multimodal-column plumbing (north-star extensions, SURVEY.md §2.12):
  * image/audio/video payloads are opaque `binary` columns + typed metadata.
  * The testdata has no real media, so the payload here is the document text
  * as bytes — the point is the Spark-side plumbing (binary columns, metadata
  * derivation, per-row feature extraction) with the actual codec decode
  * stubbed (see graft.multimodal.MediaDecode for the mapPartitions stub with
  * a deterministic fake decoder; the schema/batching there is the real shape).
  *
  * m1 exercises: string→binary cast, byte-length metadata, deterministic
  * synthetic width/height metadata, payload head sampling — all per-row
  * expressions (no shuffle).
  */
object MultimodalQueries {

  val m1BinaryMeta: Q = Q.dualSql("m1_multimodal_meta",
    sparkSql =
      """SELECT doc_id,
        |  octet_length(CAST(text AS BINARY)) AS n_bytes,
        |  'txt' AS format,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST((doc_id * 37) % 480 AS INT) AS height,
        |  substr(text, 1, 8) AS head
        |FROM documents""".stripMargin,
    duckSql =
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  'txt' AS format,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST((doc_id * 37) % 480 AS INT) AS height,
        |  substr(text, 1, 8) AS head
        |FROM documents""".stripMargin)

  /** m2: the decode path itself through the gate — binary payloads run
    * through [[graft.multimodal.MediaDecode.decodeFeatures]] (mapPartitions
    * batch decode with the clearly-marked deterministic FakeCodec stub; the
    * Spark plumbing — payload column, per-partition codec amortization,
    * frame-sample accounting — is the real shape). The oracle reproduces the
    * stub's arithmetic in SQL: the corpus is ASCII, so byte values are code
    * points, and mean_byte is one exact int-sum divided once (bit-identical
    * IEEE division both engines). */
  val m2DecodeFeatures: Q = Q(
    "m2_decode_features",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val payloads = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      graft.multimodal.MediaDecode.decodeFeatures(payloads).toDF()
        .select("doc_id", "n_bytes", "format", "width", "height",
          "n_frames_sampled", "mean_byte")
    },
    Some(
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  CASE WHEN ord(text[1]) % 2 = 0 THEN 'imgA' ELSE 'imgB' END AS format,
        |  CAST(64 + length(text) % 577 AS INT) AS width,
        |  CAST(64 + length(text) % 433 AS INT) AS height,
        |  CAST((length(text) + 63) // 64 AS INT) AS n_frames_sampled,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1),
        |         i -> ord(text[i]))) AS DOUBLE) / length(text) AS mean_byte
        |FROM documents""".stripMargin))

  /** m3: the "resize" leg of the multimodal path — payloads downsampled
    * through the same mapPartitions batch-codec plumbing (every 4th byte —
    * the stub for a real image scaler), verified END TO END on the bytes:
    * the oracle rebuilds the identical downsample in SQL and both engines
    * compare md5(resized payload) plus its length. */
  val m3Resize: Q = Q(
    "m3_resize",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, length => blen, md5}
      val payloads = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      graft.multimodal.MediaDecode.resize(payloads, stride = 4)
        .toDF("doc_id", "resized")
        .select(col("doc_id"),
          blen(col("resized")).as("n_bytes_resized"),
          md5(col("resized")).as("checksum"))
    },
    Some(
      """SELECT doc_id,
        |  CAST((length(text) + 3) // 4 AS INT) AS n_bytes_resized,
        |  md5(array_to_string(
        |    list_transform(range(1, length(text) + 1, 4), i -> text[i]), ''))
        |    AS checksum
        |FROM documents""".stripMargin))

  /** m4: frame sampling through the gate — each payload explodes into one
    * row per sampled "keyframe" ([[graft.multimodal.MediaDecode.frameSample]],
    * 16-byte windows every 64 bytes via the mapPartitions batch-codec path).
    * The oracle rebuilds the windows with substring arithmetic and compares
    * frame count, per-frame length, and md5 of the frame bytes — byte-exact
    * end to end (ASCII corpus, as in m2/m3). */
  val m4FrameSample: Q = Q(
    "m4_frame_sample",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, length => blen, md5}
      val payloads = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      graft.multimodal.MediaDecode.frameSample(payloads, stride = 64, frame = 16)
        .toDF("doc_id", "frame_idx", "frame")
        .select(col("doc_id"), col("frame_idx"),
          blen(col("frame")).as("n_bytes"), md5(col("frame")).as("checksum"))
    },
    Some(
      // bounded series + filter (same pattern as t8): max text length in the
      // testdata is 577 chars = 10 frames, far under the 100-frame bound
      """SELECT doc_id, i - 1 AS frame_idx,
        |  CAST(least(16, length(text) - (i - 1) * 64) AS INT) AS n_bytes,
        |  md5(substring(text, (i - 1) * 64 + 1, 16)) AS checksum
        |FROM documents, generate_series(1, 100) g(i)
        |WHERE i <= (length(text) + 63) // 64""".stripMargin))

  /** m5: payload-level exact dedup — the multimodal face of d1: media rows
    * dedup on the digest of their OPAQUE BINARY payload (identical bytes ⇒
    * identical asset, whatever the format), keeping the lowest id as the
    * canonical copy. One hash per payload computed in the scan, one count
    * shuffle on the 16-byte digest — at 100 TB the digest, not the payload,
    * crosses the wire. (The corpus is ASCII text-as-bytes, so DuckDB's
    * string md5 sees the same bytes as Spark's binary md5.) */
  val m5PayloadDedup: Q = Q.dualSql("m5_payload_dedup",
    sparkSql =
      """SELECT min(doc_id) AS canonical_id,
        |  md5(CAST(text AS BINARY)) AS payload_md5,
        |  count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(CAST(text AS BINARY))""".stripMargin,
    duckSql =
      """SELECT min(doc_id) AS canonical_id,
        |  md5(text) AS payload_md5,
        |  count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)""".stripMargin)

  /** m6: the multimodal INGEST pipeline end to end — decode → embed →
    * incremental near-dup admission. Payloads run through the stubbed
    * batch-codec embedding extractor ([[graft.multimodal.MediaDecode.embed]]
    * — in production a model forward pass, here the deterministic
    * byte-histogram fake), the even half builds a lake-resident IVF
    * [[graft.dedup.VectorStore]], and the odd half is admitted by
    * multi-probing its top-2 centroid partitions at rounded cosine ≥ 0.9
    * (the threshold sits in the gap between the corpus' true near-dup
    * pairs at ≥ 0.95 and the unrelated-document mass below ~0.6). The
    * oracle derives the identical embeddings in SQL (integer strided
    * byte sums, one power-of-two division), replays the k-means training
    * and the rank ≤ 2 probe relationally — d13's oracle over a derived
    * media corpus instead of the embeddings table. */
  val m6MediaEmbedAdmit: Q = Q(
    "m6_media_embed_admit",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val tmp = java.nio.file.Files.createTempDirectory("graft-m6-").toString
      val payloads = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      val media = graft.multimodal.MediaDecode.embed(payloads)
        .toDF("vec_id", "label", "embedding")
      graft.dedup.VectorStore.build(spark, s"$tmp/vx",
        media.filter(col("vec_id") % 2 === 0))
      PhaseClock.markServe("m6_media_embed_admit") // decode+build / admit split
      graft.dedup.VectorStore.admit(spark, s"$tmp/vx",
        media.filter(col("vec_id") % 2 === 1), threshold = 0.9)
    },
    Some(
      s"""WITH media AS (
         |  SELECT doc_id AS vec_id,
         |    CASE WHEN ord(text[1]) % 2 = 0 THEN 'imgA' ELSE 'imgB' END AS label,
         |    list_transform(range(0, 64), i ->
         |      COALESCE(list_sum(list_transform(
         |          range(1 + i, length(text) + 1, 64), p -> ord(text[p]))), 0)::DOUBLE
         |      - list_sum(list_transform(
         |          range(1, length(text) + 1), p -> ord(text[p])))::DOUBLE / 64) AS v
         |  FROM documents),
         |${SimilarityQueries.duckAssignedFromE(
              "e AS (SELECT vec_id, label, v FROM media WHERE vec_id % 2 = 0)")},
         |b AS (SELECT vec_id, v FROM media WHERE vec_id % 2 = 1),
         |b_probed AS (
         |  SELECT vec_id, v, c_id FROM (
         |    SELECT b.vec_id, b.v, c.c_id,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY round(${SimilarityQueries.duckCos("b.v", "c.cv")}, 6) DESC,
         |                 c.c_id) AS rk
         |    FROM b, cents c) t
         |  WHERE rk <= 2),
         |near AS (
         |  SELECT ba.vec_id, min(a.vec_id) AS near_of
         |  FROM b_probed ba JOIN assigned a ON a.c_id = ba.c_id
         |  WHERE round(${SimilarityQueries.duckCos("ba.v", "a.v")}, 6) >= 0.9
         |  GROUP BY ba.vec_id)
         |SELECT b.vec_id,
         |  CASE WHEN n.near_of IS NOT NULL THEN 'near_dup'
         |       ELSE 'admitted' END AS verdict,
         |  n.near_of AS dup_of
         |FROM b
         |LEFT JOIN near n ON n.vec_id = b.vec_id""".stripMargin))

  /** m7: PERCEPTUAL-HASH near-dup — the standard image-dedup operator (m5
    * is exact bytes, m6 is embedding-cosine; this is the cheap middle: a
    * 64-bit hash whose Hamming distance tracks content similarity).
    * [[graft.multimodal.MediaDecode.perceptualHash]] sign-quantizes the
    * decoder's embedding (SimHash over the decode — in production the
    * bits come from a DCT pHash, same plumbing), then d4's banding makes
    * the pair search non-quadratic: the 64 bits split into 4×16-bit bands,
    * only pairs sharing ≥1 band are candidates (pigeonhole: distance ≤ 3
    * is NEVER missed; 4-6 may be, the standard LSH recall trade d3/d4
    * document), and the exact XOR/bit_count Hamming ≤ 6 verify runs on
    * candidates only. One slim (hash, band) shuffle; hot-band capping
    * (d2's MaxShingleBucket) applies unchanged if a degenerate corpus
    * needs it. Oracle replays the identical sums, signs, bands, and
    * popcounts. */
  val m7PerceptualNearDup: Q = Q(
    "m7_phash_neardup",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val payloads = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
      // pin the slim (id, hi, lo) hash table once — the band explode and
      // both verify joins consume it, and an unpinned view would re-run
      // the decode per consumer (the d3 "write signatures first" shape)
      graft.multimodal.MediaDecode.perceptualHash(payloads)
        .toDF("doc_id", "h_hi", "h_lo")
        .localCheckpoint(true)
        .createOrReplaceTempView("m7h")
      spark.sql(
        """WITH bands AS (
          |  SELECT doc_id, b, CASE b
          |    WHEN 0 THEN h_hi DIV 65536 WHEN 1 THEN h_hi % 65536
          |    WHEN 2 THEN h_lo DIV 65536 ELSE h_lo % 65536 END AS k
          |  FROM m7h LATERAL VIEW explode(array(0, 1, 2, 3)) t AS b),
          |cand AS (
          |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
          |  FROM bands x JOIN bands y
          |    ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id),
          |pairs AS (
          |  SELECT c.a_id, c.b_id,
          |    CAST(bit_count(ha.h_hi ^ hb.h_hi)
          |       + bit_count(ha.h_lo ^ hb.h_lo) AS BIGINT) AS hamming
          |  FROM cand c
          |  JOIN m7h ha ON ha.doc_id = c.a_id
          |  JOIN m7h hb ON hb.doc_id = c.b_id)
          |SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 6""".stripMargin)
    },
    Some(
      """WITH media AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    COALESCE(list_sum(list_transform(
        |        range(1 + i, length(text) + 1, 64), p -> ord(text[p]))), 0)::DOUBLE
        |    - list_sum(list_transform(
        |        range(1, length(text) + 1), p -> ord(text[p])))::DOUBLE / 64) AS v
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(0, 32),
        |      i -> CASE WHEN v[i + 1] > 0 THEN (1::BIGINT << (31 - i)) ELSE 0 END)) AS h_hi,
        |    list_sum(list_transform(range(32, 64),
        |      i -> CASE WHEN v[i + 1] > 0 THEN (1::BIGINT << (63 - i)) ELSE 0 END)) AS h_lo
        |  FROM media),
        |bands AS (
        |  SELECT doc_id, b, CASE b
        |    WHEN 0 THEN h_hi // 65536 WHEN 1 THEN h_hi % 65536
        |    WHEN 2 THEN h_lo // 65536 ELSE h_lo % 65536 END AS k
        |  FROM h, (SELECT unnest(range(0, 4)) AS b) bs),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id),
        |pairs AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(bit_count(xor(ha.h_hi, hb.h_hi))
        |       + bit_count(xor(ha.h_lo, hb.h_lo)) AS BIGINT) AS hamming
        |  FROM cand c
        |  JOIN h ha ON ha.doc_id = c.a_id
        |  JOIN h hb ON hb.doc_id = c.b_id)
        |SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 6""".stripMargin))

  /** m8: DCT perceptual-hash near-dup — m7's banding and verify verbatim,
    * with the hash upgraded from the sign-quantized stub embedding to the
    * PRODUCTION pHash pipeline ([[graft.multimodal.MediaDecode.DctHash]]:
    * 32×32 grid → fixed-point 2-D DCT-II → 8×8 low band → exact-integer
    * median threshold; round-14 verdict "What's missing #4"). All
    * arithmetic is integer over a 256-constant pre-scaled cosine basis, and
    * the oracle embeds the SAME constants (built from the same array), so
    * DuckDB replays the transform bit-for-bit — 512 k pixel rows joined
    * against the basis, two aggregation passes, the order-statistic median.
    *
    * The corpus plants LENGTH-PRESERVING near-dups (byte 5 overlaid on
    * every tenth document — the stub grid tiles by payload length, so only
    * same-length perturbations model a re-encoded image): planted pairs
    * land at Hamming 0-6, the background floor sits at ≥16, and the ≤6
    * verify separates them cleanly — the bimodal gap a production pHash is
    * chosen for. */
  val m8DctPhashNearDup: Q = {
    val dct = graft.multimodal.MediaDecode.DctHash
    val bandSql =
      """WITH bands AS (
        |  SELECT doc_id, b, CASE b
        |    WHEN 0 THEN h_hi DIV 65536 WHEN 1 THEN h_hi % 65536
        |    WHEN 2 THEN h_lo DIV 65536 ELSE h_lo % 65536 END AS k
        |  FROM m8h LATERAL VIEW explode(array(0, 1, 2, 3)) t AS b),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id),
        |pairs AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(bit_count(ha.h_hi ^ hb.h_hi)
        |       + bit_count(ha.h_lo ^ hb.h_lo) AS BIGINT) AS hamming
        |  FROM cand c
        |  JOIN m8h ha ON ha.doc_id = c.a_id
        |  JOIN m8h hb ON hb.doc_id = c.b_id)
        |SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 6""".stripMargin
    Q(
      "m8_dct_phash_neardup",
      (spark, dir) => {
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        Tables.registerAll(spark, dir)
        val payloads = spark.sql(
          """SELECT doc_id, CAST(text AS BINARY) AS payload FROM (
            |  SELECT doc_id, text FROM documents
            |  UNION ALL
            |  SELECT doc_id + 1000000,
            |    concat(substring(text, 1, 4), 'z', substring(text, 6))
            |  FROM documents WHERE doc_id % 10 = 0)""".stripMargin)
          .as[(Long, Array[Byte])]
        graft.multimodal.MediaDecode.dctPerceptualHash(payloads)
          .toDF("doc_id", "h_hi", "h_lo")
          .localCheckpoint(true)
          .createOrReplaceTempView("m8h")
        spark.sql(bandSql)
      },
      Some {
        val n = dct.N; val band = dct.Band
        val tvals = (0 until band).flatMap(u => (0 until n).map(x =>
          s"($u, $x, ${dct.T(u)(x)})")).mkString(", ")
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000,
           |    substring(text, 1, 4) || 'z' || substring(text, 6)
           |  FROM documents WHERE doc_id % 10 = 0),
           |tt(u, x, t) AS (VALUES $tvals),
           |px AS (
           |  SELECT doc_id, i // $n AS r, i % $n AS c,
           |    CASE WHEN length(text) = 0 THEN 0
           |         ELSE ord(text[(i % length(text)) + 1]) END AS p
           |  FROM corpus, (SELECT unnest(range(0, ${n * n})) AS i)),
           |f1 AS (
           |  SELECT px.doc_id, tt.u, px.c, SUM(px.p * tt.t)::BIGINT AS s
           |  FROM px JOIN tt ON tt.x = px.r GROUP BY 1, 2, 3),
           |f AS (
           |  SELECT f1.doc_id, f1.u, tt.u AS v, SUM(f1.s * tt.t)::BIGINT AS s
           |  FROM f1 JOIN tt ON tt.x = f1.c GROUP BY 1, 2, 3),
           |med AS (
           |  SELECT doc_id, s AS m FROM (
           |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY s) AS rn
           |    FROM f WHERE u + v > 0) z WHERE rn = 32),
           |m8h AS (
           |  SELECT f.doc_id,
           |    SUM(CASE WHEN f.u * $band + f.v < 32 AND f.s > med.m
           |        THEN (1::BIGINT << (31 - (f.u * $band + f.v))) ELSE 0 END)::BIGINT AS h_hi,
           |    SUM(CASE WHEN f.u * $band + f.v >= 32 AND f.s > med.m
           |        THEN (1::BIGINT << (63 - (f.u * $band + f.v))) ELSE 0 END)::BIGINT AS h_lo
           |  FROM f JOIN med ON med.doc_id = f.doc_id GROUP BY 1),
           |bands AS (
           |  SELECT doc_id, b, CASE b
           |    WHEN 0 THEN h_hi // 65536 WHEN 1 THEN h_hi % 65536
           |    WHEN 2 THEN h_lo // 65536 ELSE h_lo % 65536 END AS k
           |  FROM m8h, (SELECT unnest(range(0, 4)) AS b) bs),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
           |  FROM bands x JOIN bands y
           |    ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id),
           |pairs AS (
           |  SELECT c.a_id, c.b_id,
           |    CAST(bit_count(xor(ha.h_hi, hb.h_hi))
           |       + bit_count(xor(ha.h_lo, hb.h_lo)) AS BIGINT) AS hamming
           |  FROM cand c
           |  JOIN m8h ha ON ha.doc_id = c.a_id
           |  JOIN m8h hb ON hb.doc_id = c.b_id)
           |SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 6""".stripMargin
      })
  }

  val all: Seq[Q] = Seq(m1BinaryMeta, m2DecodeFeatures, m3Resize, m4FrameSample,
    m5PayloadDedup, m6MediaEmbedAdmit, m7PerceptualNearDup, m8DctPhashNearDup)
}
