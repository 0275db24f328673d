package graft.table

import org.apache.spark.sql.sources._

/** Pushed-filter → manifest-stats bounds translation shared by every scan
  * surface over a [[VersionedTable]] (the V1 `graft-table` relation and the
  * DSv2 catalog scan). File pruning here is NOT advisory — a pruned file is
  * never opened, so row-level re-filtering cannot resurrect its rows — which
  * makes exact value rendering a correctness requirement, not a nicety. */
object StatsBounds {

  /** Render a pushed filter value EXACTLY as the manifest stats render
    * column values (Spark's cast-to-string of the scanned column): the
    * prune-time comparison is string-vs-string (BigDecimal for kind "num",
    * lexicographic for "str"), so a value rendered any other way silently
    * drops live files. Temporals: the stats cast renders the instant in the
    * SESSION time zone with the fractional second trimmed of trailing zeros
    * and omitted when whole — `java.sql.Timestamp.toString` instead renders
    * ".0" for whole seconds and uses the JVM default zone, so both Timestamp
    * and Instant go through one session-zone formatter. Dates are zone-free
    * ISO either way. A value of any unrecognized type contributes NO bound:
    * no pruning, always safe. */
  def render(v: Any, sessionZone: String): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case n: java.lang.Number => Some(n.toString)
    case b: java.lang.Boolean => Some(b.toString)
    case t: java.sql.Timestamp => renderInstant(t.toInstant, sessionZone)
    case i: java.time.Instant => renderInstant(i, sessionZone)
    case d: java.sql.Date => Some(d.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case _ => None
  }

  private def renderInstant(i: java.time.Instant, sessionZone: String): Option[String] = {
    val t = java.time.LocalDateTime.ofInstant(i, java.time.ZoneId.of(sessionZone))
    val frac =
      if (t.getNano == 0) ""
      else "." + f"${t.getNano}%09d".reverse.dropWhile(_ == '0').reverse
    Some(f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d$frac")
  }

  /** Conjunctive filters → per-column EXACT value lists (`IN`-shaped
    * pushdowns) for Bloom-sidecar probing: a range bound [min(IN), max(IN)]
    * loses the individual values, but a Bloom filter can test each one.
    * Values are rendered exactly as [[render]] does (the stats zone
    * convention); null members disable the column (NULL semantics differ).
    * Plain equality is not re-emitted — [[bounds]] already carries it as a
    * degenerate [v, v] range the equality probe uses. */
  def exactValues(filters: Array[Filter], sessionZone: String)
      : Seq[(String, Seq[String])] =
    filters.toSeq.flatMap {
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        val rendered = vs.toSeq.map(v => render(v, sessionZone))
        if (rendered.exists(_.isEmpty)) Nil else Seq((c, rendered.flatten))
      case And(l, r) => exactValues(Array(l), sessionZone) ++ exactValues(Array(r), sessionZone)
      case _ => Nil
    }

  /** Conjunctive filters → per-column nullness requirements for
    * nullCount-stat skipping: `(col, true)` = the query needs NULL rows of
    * `col` (IS NULL — a file whose nullCount is 0 is skipped), `(col,
    * false)` = it needs NON-NULL rows (IS NOT NULL, which Spark also
    * injects for every referenced column — a file whose nullCount equals
    * its row count is skipped). Only top-level conjuncts qualify; an
    * IsNull under OR cannot prune alone and contributes nothing. */
  def nullness(filters: Array[Filter]): Seq[(String, Boolean)] =
    filters.toSeq.flatMap {
      case IsNull(c) => Seq((c, true))
      case IsNotNull(c) => Seq((c, false))
      case And(l, r) => nullness(Array(l)) ++ nullness(Array(r))
      case _ => Nil
    }

  /** Conjunctive filters → per-column [lo, hi] bounds for stats skipping.
    * Only shapes whose bound is exact survive; everything else contributes
    * no bound (and is still applied row-level by Spark). An In's min/max is
    * taken in the ORDER the prune-time comparison will use — numeric when
    * every value is numeric (a numeric column's stats kind is "num"),
    * lexicographic otherwise — never the lexicographic order of numeric
    * strings (IN (5, 3000) would otherwise bound to [3000, 5] and prune
    * every matching file). */
  def bounds(filters: Array[Filter], sessionZone: String)
      : Seq[(String, Option[String], Option[String])] = {
    def r(v: Any): Option[String] = render(v, sessionZone)
    filters.toSeq.flatMap {
      case EqualTo(c, v) => r(v).map(s => (c, Some(s), Some(s))).toSeq
      case GreaterThan(c, v) => r(v).map(s => (c, Some(s), None: Option[String])).toSeq
      case GreaterThanOrEqual(c, v) => r(v).map(s => (c, Some(s), None: Option[String])).toSeq
      case LessThan(c, v) => r(v).map(s => (c, None: Option[String], Some(s))).toSeq
      case LessThanOrEqual(c, v) => r(v).map(s => (c, None: Option[String], Some(s))).toSeq
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        val rendered = vs.toSeq.map(r)
        if (rendered.exists(_.isEmpty)) Nil
        else {
          val ss = rendered.flatten
          if (vs.forall(_.isInstanceOf[java.lang.Number])) {
            // NaN renders unparseable — emit no bound rather than misorder
            val keys = ss.map(s => scala.util.Try(BigDecimal(s)).toOption)
            if (keys.exists(_.isEmpty)) Nil
            else {
              val sorted = ss.sortBy(s => BigDecimal(s))
              Seq((c, Some(sorted.head), Some(sorted.last)))
            }
          } else Seq((c, Some(ss.min), Some(ss.max)))
        }
      case And(l, r0) => bounds(Array(l), sessionZone) ++ bounds(Array(r0), sessionZone)
      case _ => Nil
    }
  }
}
