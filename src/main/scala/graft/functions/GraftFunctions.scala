package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the engine's native SQL functions.
  *
  * Two integration points:
  *  - [[GraftFunctions.registerAll]] for an existing session (temp functions)
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *    (session-builder injection — the idiomatic library hook)
  */
object GraftFunctions {

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> (exprs => MinHashSignature(exprs.head)),
    "rolling_min_hash" -> (exprs => exprs match {
      case Seq(text) => RollingMinHash(text, 8)
      case Seq(text, k) => RollingMinHash(
        text, k.eval().asInstanceOf[Number].intValue())
      case other => throw new IllegalArgumentException(
        s"rolling_min_hash expects (text[, k]), got ${other.size} args")
    }))

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `SparkSessionExtensions` hook: inject the engine's functions at session
  * build time (`.withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (exprs: Seq[Expression]) => RollingMinHash(exprs.head, 8)))
  }
}
