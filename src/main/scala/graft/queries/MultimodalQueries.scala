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

  val all: Seq[Q] = Seq(m1BinaryMeta)
}
