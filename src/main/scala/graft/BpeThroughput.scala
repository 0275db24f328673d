package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, size => asize, sum => fsum}

/** One-off throughput measurement for the native [[graft.functions.BpeEncode]]
  * expression — the provenance of the BASELINE.md bpe_encode rows/s stamp,
  * kept as a main so the number is reproducible on demand (NOT part of the
  * per-round `graft.Bench` suite: it encodes a corpus replicated to ~200 k
  * docs, a scale measurement rather than a gate entry).
  *
  * Usage: `sbt "runMain graft.BpeThroughput [sfDir] [xfact] [rounds...]"`
  * Defaults: sf0.1, 40 copies (~200 k docs / ~59 MB of text), merge
  * vocabularies of 256 and 2000 trained from the weighted bigram set — the
  * two points that show the encode cost is flat in vocabulary size (the
  * whole reason the expression exists; t21's chained replace is linear in
  * it). */
object BpeThroughput {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val xfact = args.lift(1).map(_.toInt).getOrElse(40)
    val rounds = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(256, 2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-bpe-throughput").getOrCreate()
    try {
      spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
      val wset = spark.sql(
        """SELECT concat(w1, ' ', w2) AS bg, CAST(count(*) AS BIGINT) AS n
          |FROM (SELECT w AS w1, l[pos + 1] AS w2
          |      FROM (SELECT split(text, ' ') AS l FROM documents) t
          |      LATERAL VIEW posexplode(slice(l, 1, size(l) - 1)) p AS pos, w)
          |WHERE w1 RLIKE '^[a-z]+$' AND w2 RLIKE '^[a-z]+$'
          |GROUP BY 1 ORDER BY n DESC, bg LIMIT 4000""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val chars = spark.sql("SELECT CAST(sum(length(text)) AS BIGINT) FROM documents")
        .collect()(0).getLong(0)
      println(s"[bpe-throughput] working set ${wset.size} bigrams, " +
        s"corpus ${chars} chars x $xfact")
      val big = spark.sql(
        s"SELECT d.text FROM documents d CROSS JOIN (SELECT id FROM range($xfact)) r")
        .repartition(32).persist()
      val nd = big.count()
      // FAMILY env selects the measured family (char | bytes | both) — each
      // family deserves its own JVM when stamping: in-process back-to-back
      // rounds contend on code cache + GC and later rounds read noisy
      if (!sys.env.get("FAMILY").contains("bytes")) rounds.foreach { r =>
        var t0 = System.nanoTime()
        val merges = graft.functions.BpeTrain.train(wset, r)
        val trainS = (System.nanoTime() - t0) / 1e9
        val arr = merges.map { case (a, b) => a + "\u001F" + b }.toArray
        val toks = org.apache.spark.sql.graft.PlanShim.column(
          graft.functions.BpeEncode(
            org.apache.spark.sql.graft.PlanShim.expression(col("text")),
            org.apache.spark.sql.graft.PlanShim.expression(lit(arr))))
        big.limit(100).select(asize(toks).as("n")).agg(fsum("n")).collect() // warm codegen
        t0 = System.nanoTime()
        val ntok = big.select(asize(toks).cast("long").as("n"))
          .agg(fsum("n")).collect()(0).getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-throughput] merges=${merges.size} train=$trainS%.2fs " +
          f"encode: docs=$nd tokens=$ntok secs=$secs%.2f " +
          f"docs_per_s=${nd / secs}%.0f mb_per_s=${chars.toDouble * xfact / secs / 1e6}%.1f " +
          f"tokens_per_s=${ntok / secs}%.0f")
      }
      // the byte-level sibling (bpe_encode_bytes, t25): the same corpus
      // through CAST(text AS BINARY), the working set remapped through the
      // GPT-2 byte table and trained at the same vocabulary points
      if (!sys.env.get("FAMILY").contains("char")) rounds.foreach { r =>
        val wsetB = wset.map { case (bg, n) =>
          (graft.functions.BpeCodec.remapUtf8(bg), n) }
        var t0 = System.nanoTime()
        val merges = graft.functions.BpeTrain.train(wsetB, r)
        val trainS = (System.nanoTime() - t0) / 1e9
        val arr = merges.map { case (a, b) => a + "\u001F" + b }.toArray
        val toks = org.apache.spark.sql.graft.PlanShim.column(
          graft.functions.BpeEncodeBytes(
            org.apache.spark.sql.graft.PlanShim.expression(col("text").cast("binary")),
            org.apache.spark.sql.graft.PlanShim.expression(lit(arr))))
        big.limit(100).select(asize(toks).as("n")).agg(fsum("n")).collect() // warm
        t0 = System.nanoTime()
        val ntok = big.select(asize(toks).cast("long").as("n"))
          .agg(fsum("n")).collect()(0).getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-throughput] BYTES merges=${merges.size} train=$trainS%.2fs " +
          f"encode: docs=$nd tokens=$ntok secs=$secs%.2f " +
          f"docs_per_s=${nd / secs}%.0f mb_per_s=${chars.toDouble * xfact / secs / 1e6}%.1f " +
          f"tokens_per_s=${ntok / secs}%.0f")
      }
      // the A/B the expression replaces: t21's rank-chained replace columns
      // at the first requested vocabulary size (set CHAINED=0 to skip)
      if (!sys.env.get("CHAINED").contains("0")) {
        import org.apache.spark.sql.functions.{concat, expr, regexp_replace}
        val merges = graft.functions.BpeTrain.train(wset, rounds.head)
        val sep = "\u001F"; val sep2 = sep + sep
        val init = concat(lit(sep2),
          regexp_replace(col("text"), lit("(?s)(.)"), lit("$1" + sep2)))
        val chained = merges.foldLeft(init) { case (c, (a, b)) =>
          org.apache.spark.sql.functions.replace(c,
            lit(sep + a + sep2 + b + sep), lit(sep + a + b + sep))
        }
        val n = big.select(chained.as("s"))
          .select(expr(s"size(filter(split(s, '$sep2'), x -> x != '' AND x != ' '))")
            .cast("long").as("n"))
        n.limit(100).agg(fsum("n")).collect() // warm
        val t0 = System.nanoTime()
        val ntok = n.agg(fsum("n")).collect()(0).getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-throughput] CHAINED merges=${merges.size} docs=$nd " +
          f"tokens=$ntok secs=$secs%.2f docs_per_s=${nd / secs}%.0f")
      }
      big.unpersist()
    } finally spark.stop()
  }
}
