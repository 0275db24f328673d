package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style column profiling: one distributed pass over the input
  * producing a long-format stats table, one row per profiled column —
  * the data-quality summary stage every ingest pipeline runs before
  * trusting a new batch (row/null/distinct counts, value ranges, mean).
  *
  * The reference has no profiling stage — its quality story is `uat`-gated
  * spot queries (`example/notebook/scd2-job.ipynb:443-444`) and the
  * `%printschema` inspection magic (`scd2-job.ipynb:66-67`); this is that
  * idea made systematic, and it pairs with SQLAssert (assert after profile).
  *
  * Scale design: ALL columns profile in ONE aggregation over ONE scan — no
  * per-column job, no driver loop over data. The multiple COUNT(DISTINCT)s
  * plan through Catalyst's Expand (k× row multiplication before a partial
  * aggregate), which trades map-side rows for a single shuffle whose width
  * is the number of (group, distinct-value) pairs — at 100 TB swap exact
  * NDV for approx_count_distinct via `exactNdv = false` and the Expand
  * collapses to one HLL sketch per column (same plan shape as any partial
  * agg). The final unpivot touches one row.
  *
  * Cross-engine determinism (the gate's hash compare): means avoid
  * double-sum ordering sensitivity by summing in DECIMAL(30,6) and dividing
  * once at the end; timestamps render through a fixed-width microsecond
  * format rather than engine-default casts.
  */
object Profiler {

  /** Profile `cols` of `df` (default: every column of a supported type).
    * Output schema (one row per column):
    * {{{
    * col_name:   string  — the profiled column
    * n_rows:     long    — table row count (same every row)
    * n_nonnull:  long    — non-null count
    * n_distinct: long    — distinct non-null count (exact or approx)
    * min_num / max_num / mean: double — numeric columns, else null
    * min_str / max_str: string — string/timestamp/date columns, else null
    * }}} */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              exactNdv: Boolean = true): DataFrame = {
    val fields = df.schema.fields.filter(f => cols.isEmpty || cols.contains(f.name))
    val missing = cols.filterNot(c => df.schema.fieldNames.contains(c))
    require(missing.isEmpty, s"profile references unknown column(s): ${missing.mkString(", ")}")
    val supported = fields.filter(f => isNumeric(f.dataType) || isStringish(f.dataType))
    require(supported.nonEmpty, "no profilable columns (numeric/string/timestamp/date)")

    def ndv(c: Column): Column =
      if (exactNdv) count_distinct(c) else approx_count_distinct(c)
    // fixed-width rendering so both engines print the same bytes
    def asStr(f: StructField): Column = f.dataType match {
      case TimestampType | TimestampNTZType =>
        date_format(col(f.name), "yyyy-MM-dd HH:mm:ss.SSSSSS")
      case DateType => date_format(col(f.name), "yyyy-MM-dd")
      case _ => col(f.name).cast(StringType)
    }

    val aggs: Seq[Column] = supported.zipWithIndex.flatMap { case (f, i) =>
      val base = Seq(
        count(col(f.name)).as(s"nn_$i"),
        ndv(col(f.name)).as(s"ndv_$i"))
      val typed =
        if (isNumeric(f.dataType)) Seq(
          min(col(f.name)).cast(DoubleType).as(s"mn_$i"),
          max(col(f.name)).cast(DoubleType).as(s"mx_$i"),
          sum(col(f.name).cast(DecimalType(30, 6))).as(s"sum_$i"))
        else Seq(
          min(asStr(f)).as(s"smn_$i"),
          max(asStr(f)).as(s"smx_$i"))
      base ++ typed
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)

    val rows: Column = array(supported.zipWithIndex.map { case (f, i) =>
      val (mnN, mxN, mean, mnS, mxS) =
        if (isNumeric(f.dataType)) (
          col(s"mn_$i"), col(s"mx_$i"),
          // decimal sum / count: both engines divide the same exact sum once
          (col(s"sum_$i").cast(DoubleType) / col(s"nn_$i")).as("mean"),
          lit(null).cast(StringType), lit(null).cast(StringType))
        else (
          lit(null).cast(DoubleType), lit(null).cast(DoubleType),
          lit(null).cast(DoubleType), col(s"smn_$i"), col(s"smx_$i"))
      struct(
        lit(f.name).as("col_name"), col("n_rows").as("n_rows"),
        col(s"nn_$i").as("n_nonnull"), col(s"ndv_$i").as("n_distinct"),
        mnN.as("min_num"), mxN.as("max_num"), mean.as("mean"),
        mnS.as("min_str"), mxS.as("max_str"))
    }: _*)

    one.select(explode(rows).as("p")).select("p.*")
  }

  private def isNumeric(t: DataType): Boolean = t.isInstanceOf[NumericType]
  private def isStringish(t: DataType): Boolean = t match {
    case StringType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
}
