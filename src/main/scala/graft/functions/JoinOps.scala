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
    // monotonically_increasing_id in the salt spreads even byte-identical
    // duplicate rows of a hot key (hashing row content would send them all
    // to one bucket, defeating the mitigation)
    val saltCol = pmod(hash(col(key), monotonically_increasing_id()), lit(salts))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
