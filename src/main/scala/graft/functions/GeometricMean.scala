package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate via `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.10:
  * the idiomatic tier for user-defined aggregates below a full
  * TypedImperativeAggregate). Geometric mean as exp(mean(ln x)) with a
  * (sum-of-logs, count) buffer — map-side partial aggregation comes free
  * from the Aggregator contract (merge is associative), so the shuffle
  * carries two doubles per group regardless of input size. Non-positive
  * inputs are SKIPPED (geometric mean over the positive subset) — callers
  * comparing against exp(avg(ln x)) formulations must filter x > 0 the same
  * way (q31 does). */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
