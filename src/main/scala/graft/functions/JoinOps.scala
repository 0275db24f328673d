package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-path join utilities (SURVEY.md "optimize for scale"): skew salting
  * and bucketed co-location are the two standard answers when AQE's skew
  * handling and broadcast thresholds aren't enough. */
object JoinOps {

  /** Salted inner equi-join for a skewed LEFT key: the left side gets a
    * pseudo-random salt in [0, salts), the right side is replicated `salts`
    * times, and the join key becomes (key, salt) — splitting each hot key's
    * rows across `salts` reducers. Result is row-identical to the plain join;
    * cost is `salts`× replication of the right side, so use it when the right
    * side is modest but too big to broadcast and the left key histogram has a
    * heavy tail. (AQE skew-join handles many of these automatically; explicit
    * salting is for the cases it can't split, e.g. a single monster key in a
    * sort-merge join feeding an aggregation.) */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int = 8): DataFrame = {
    require(salts > 0)
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs already have a __salt column — withColumn would silently clobber it")
    // monotonically_increasing_id in the salt spreads even byte-identical
    // duplicate rows of a hot key (hashing row content would send them all
    // to one bucket, defeating the mitigation)
    val saltCol = pmod(hash(col(key), monotonically_increasing_id()), lit(salts))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered semi join (the runtime-filter pattern Spark applies
    * to shuffle joins, made explicit): build a Bloom filter over the dim
    * side's join keys on the driver, broadcast it, and drop non-matching
    * fact rows BEFORE the shuffle; a final exact left-semi join removes the
    * filter's false positives. Result is row-identical to
    * `fact SEMI JOIN dim`, but the fact side shuffled into the join shrinks
    * from |fact| to ~|matches| · (1+fpp) — at 100 TB that is the difference
    * between shuffling the table and shuffling the answer. Keys must be
    * integral (cast to long on both sides). */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey).cast("long").as(dimKey)).filter(col(dimKey).isNotNull)
    // a shuffle-free row count sizes the filter: duplicates overcount, which
    // only widens bits-per-key — correctness never depends on the size, the
    // exact semi join below removes every false positive regardless
    val n = math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(dimKey, n, fpp)
    // the probe is Spark's native BloomFilterMightContain (the codegen'd
    // expression behind its injected runtime filters), NOT a Scala UDF: the
    // filter ships as a plan literal — deserialized once per task, evaluated
    // inside whole-stage codegen, no serialization boundary on the fact scan
    val bytes = { val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray }
    GraftFunctions.registerAll(fact.sparkSession)
    fact.filter(call_function("bloom_might_contain", lit(bytes), col(factKey).cast("long")))
      .join(keys.select(col(dimKey).as("__dk")), col(factKey).cast("long") === col("__dk"),
        "left_semi")
  }

  /** Equi-ized time-range join: inner-join left and right rows sharing `key`
    * with `unix_micros(right.tsR)` in `[unix_micros(left.tsL) - beforeSec,
    * ... + afterSec]` (seconds). A naive theta join is a per-key cross
    * product; here time is bucketed at width >= the window span, the left
    * side explodes to the 1-2 buckets its window overlaps, and the join is a
    * plain hash equi-join on (key, bucket) with the exact range applied as a
    * residual — cost O(matches), shuffle on (key, bucket) so a hot key's
    * rows also spread over time. All non-key column names must be distinct
    * across the two sides. Epochs must be non-negative (`div` truncation). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   beforeSec: Long, afterSec: Long): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0, "window bounds must be non-negative")
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "inputs already have a __b column — withColumn would silently clobber it")
    val w = math.max((beforeSec + afterSec) * 1000000L, 1L)
    val l = left.withColumn("__b", explode(sequence(
      expr(s"(unix_micros($leftTs) - ${beforeSec * 1000000L}L) div ${w}L"),
      expr(s"(unix_micros($leftTs) + ${afterSec * 1000000L}L) div ${w}L"))))
    val r = right.withColumn("__b", expr(s"unix_micros($rightTs) div ${w}L"))
    l.join(r, Seq(key, "__b"))
      .filter(expr(s"""unix_micros($rightTs)
                      | BETWEEN unix_micros($leftTs) - ${beforeSec * 1000000L}L
                      | AND unix_micros($leftTs) + ${afterSec * 1000000L}L""".stripMargin))
      .drop("__b")
  }
}
