package graft.catalog

import graft.table.{StatsBounds, VersionedTable}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform, Expression => VExpression, Literal => VLiteral}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse, AlwaysTrue, Predicate, And => VAnd, Not => VNot, Or => VOr}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwriteV2, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DSv2 face of a [[VersionedTable]]: batch reads through the same
  * stats-pruned scan the `graft-table` V1 relation uses (the V1Scan
  * fallback keeps Spark's whole parquet read/write machinery — columnar
  * batches, codegen — instead of reimplementing a reader), appends and
  * overwrites as versioned commits, and row-level SQL:
  *
  *  - `DELETE FROM` with a translatable predicate routes here natively via
  *    [[SupportsDeleteV2]] — COW rewrite or MOR deletion vectors, chosen by
  *    the `enableDeletionVectors` table property (Delta's knob);
  *  - `UPDATE` / `MERGE INTO` (and untranslatable deletes) go through
  *    [[GraftExtensions]]' analyzer rule to the merge kernel.
  *
  * A `versionAsOf` instance (from `VERSION AS OF` / `TIMESTAMP AS OF`) is a
  * read-only snapshot: writes and deletes refuse. */
class GraftTable(val table: VersionedTable, tableName: String,
    val versionAsOf: Option[Long]) extends Table
    with SupportsRead with SupportsWrite with SupportsDeleteV2 {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = tableName

  override def schema(): StructType =
    table.schemaOf(table.resolve(None, versionAsOf)).getOrElse(new StructType())

  override def partitioning(): Array[Transform] =
    table.latestVersion().map(table.partitionByOf).getOrElse(Nil)
      .map(c => Expressions.identity(c)).toArray

  override def properties(): java.util.Map[String, String] =
    (table.properties + ("path" -> table.root)).asJava

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      // MERGE WITH SCHEMA EVOLUTION: Spark computes the additive column
      // set, drives it through GraftCatalog.alterTable (→ evolveSchema,
      // metadata-only), and re-resolves the widened target
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** Report the manifest's CHECK constraints (version-pinned metadata) so
    * DESCRIBE and the ADD/DROP CONSTRAINT analyzer see the live set. */
  override def constraints():
      Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    table.constraintsOf(table.resolve(None, versionAsOf)).toSeq.sortBy(_._1)
      .map { case (n, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(n).predicateSql(sql).build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
      }.toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, table, versionAsOf, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(versionAsOf.isEmpty,
      s"cannot write to a time-travel snapshot of ${table.root}")
    new GraftWriteBuilder(table)
  }

  private def morEnabled: Boolean =
    table.properties.get("enableDeletionVectors").contains("true")

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    versionAsOf.isEmpty && predicates.forall(p => PredicateSql.translate(p).isDefined)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    require(versionAsOf.isEmpty,
      s"cannot delete from a time-travel snapshot of ${table.root}")
    val cond =
      if (predicates.isEmpty) "TRUE"
      else predicates.map(p => PredicateSql.translate(p).getOrElse(
        throw new UnsupportedOperationException(s"untranslatable delete predicate $p")))
        .mkString(" AND ")
    if (morEnabled) table.deleteMor(spark, cond) else table.delete(spark, cond)
    ()
  }

  override def toString: String = s"GraftTable($tableName)"
}

/** Filter pushdown feeds the same manifest-stats file pruning as the V1
  * relation; every filter is returned as residual, so Spark still applies
  * them row-level (pruning only SKIPS FILES, exactly like [[
  * graft.streaming.TableRelation]]).
  *
  * Aggregate pushdown: an UNFILTERED, UNGROUPED `count(*)` is answered
  * from manifest metadata alone ([[VersionedTable.rowCountOf]]: per-file
  * `__rows` stats, deletion-vector tombstones subtracted) — at 100 TB
  * `SELECT count(*)` costs one manifest read instead of a full scan.
  * Spark only attempts aggregate pushdown when every filter pushed
  * completely; since this builder keeps all filters residual, a filtered
  * aggregate can never take the metadata path by construction. Tables
  * whose files predate row-count stats (or opted stats off) reject the
  * pushdown and scan normally. MIN/MAX are served from stats ONLY for a
  * DV-FREE snapshot on numeric/string columns with the stat in every live
  * file ([[VersionedTable.metaMinMax]]) — the common append-only analytics
  * shape, where `SELECT max(ts_col)` is a constant freshness probe. A DV
  * tombstone may hide the extreme row and temporal stats are zone-rendered
  * (order-correct for pruning, value-unsafe to RETURN), so those cases
  * reject and scan — a guess is never served. */
final class GraftScanBuilder(spark: SparkSession, t: VersionedTable,
    versionAsOf: Option[Long], fullSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  // manifest-answered aggregate row: one (value, type) per aggregate expr
  private var metaAgg: Option[Seq[(Any, org.apache.spark.sql.types.DataType)]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: the scan skips files, Spark filters rows
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    serve(agg).isDefined

  /** A rendered stat string converted back to the column's EXTERNAL row
    * type. Integral and string round-trips are exact by construction;
    * Float/Double round-trip exactly through Java's toString/parse;
    * Decimal re-scales without rounding or refuses. Temporal types never
    * reach here (gated out — zone-rendered stats are a wrong-answer trap
    * for a VALUE, even though they order correctly for pruning). */
  private def typedStat(s: String,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    import scala.util.Try
    dt match {
      case ByteType => Try(s.toByte).toOption
      case ShortType => Try(s.toShort).toOption
      case IntegerType => Try(s.toInt).toOption
      case LongType => Try(s.toLong).toOption
      case FloatType => Try(s.toFloat).toOption
      case DoubleType => Try(s.toDouble).toOption
      case d: DecimalType => Try(new java.math.BigDecimal(s)
        .setScale(d.scale)).toOption.filter(_.precision <= d.precision)
      case StringType => Some(s)
      case _ => None
    }
  }

  /** The aggregation as a manifest-answered row, or None when any part of
    * it cannot be served SOUNDLY: count(*) needs complete per-file row
    * counts (DV tombstones subtract); MIN/MAX additionally need a DV-FREE
    * snapshot, the stat in every live file, and a numeric/string column
    * (see [[VersionedTable.metaMinMax]]). Filters must be absent and the
    * aggregation ungrouped — Spark only offers the pushdown then anyway,
    * since every filter stays residual here. */
  private def serve(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[(Any, org.apache.spark.sql.types.DataType)]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.types.{LongType, NumericType, StringType}
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return None
    val v = versionAsOf.getOrElse(-1L)
    def colNameOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    def minmax(e: org.apache.spark.sql.connector.expressions.Expression,
        isMin: Boolean): Option[(Any, org.apache.spark.sql.types.DataType)] =
      for {
        c <- colNameOf(e)
        f <- fullSchema.fields.find(_.name == c)
        if f.dataType.isInstanceOf[NumericType] || f.dataType == StringType
        (mn, mx) <- t.metaMinMax(v, c)
        value <- typedStat(if (isMin) mn else mx, f.dataType)
      } yield (value, f.dataType)
    val vals = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        t.rowCountOf(spark, v).map(n => (n: Any, LongType
          : org.apache.spark.sql.types.DataType))
      // count(col) = Σ rows − Σ nulls from the nullCount pseudo-stats —
      // DV-free snapshots only; count(DISTINCT col) can never serve
      case c: Count if !c.isDistinct =>
        colNameOf(c.column).flatMap(t.metaNonNullCount(v, _))
          .map(n => (n: Any, LongType: org.apache.spark.sql.types.DataType))
      case m: Min => minmax(m.column, isMin = true)
      case m: Max => minmax(m.column, isMin = false)
      case _ => None
    }
    if (vals.exists(_.isEmpty)) None else Some(vals.flatten)
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    metaAgg = serve(agg)
    metaAgg.isDefined
  }

  override def build(): Scan = metaAgg match {
    case Some(vals) => new V1Scan {
      override def readSchema(): StructType = GraftMetaAggScan.schemaOf(vals)
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new GraftMetaAggScan(context, vals).asInstanceOf[T]
      override def description(): String =
        s"GraftMetaAggScan(${t.root}, ${vals.map(_._1).mkString(",")})"
    }
    case None => new V1Scan
        with org.apache.spark.sql.connector.read.SupportsReportStatistics {
      override def readSchema(): StructType = required

      /** Manifest-derived plan statistics — the estimate Spark's join
        * planner compares against `autoBroadcastJoinThreshold`. Without
        * this a DSv2 relation costs `defaultSizeInBytes` (Long.MaxValue):
        * a 100-row dimension table would never broadcast and every
        * dim-fact join would sort-merge. numRows comes from the manifest's
        * per-file `__rows` REFINED by the pushed filters' stats pruning
        * ([[VersionedTable.estimateLiveRows]] — pure in-memory metadata,
        * no I/O at plan time); sizeInBytes is Spark's own row-width
        * convention (8 + Σ defaultSize over the PRUNED read schema), so
        * column pruning shrinks the estimate exactly like it shrinks the
        * exchange. Stats-less files → empty optionals → Spark's default. */
      override def estimateStatistics()
          : org.apache.spark.sql.connector.read.Statistics = {
        // estimates must never fail planning (snapshot races) — empty
        // optionals fall back to Spark's conservative default
        val rows = try {
          val v = t.resolve(None, versionAsOf)
          val zone = t.statsRenderZone(spark, None, versionAsOf)
          t.estimateLiveRows(v, StatsBounds.bounds(pushed, zone),
            StatsBounds.nullness(pushed))
        } catch { case _: Exception => None }
        val rowBytes = 8L + required.fields.map(_.dataType.defaultSize.toLong).sum
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            rows.map(r => java.util.OptionalLong.of(math.max(1L, r * rowBytes)))
              .getOrElse(java.util.OptionalLong.empty())
          override def numRows(): java.util.OptionalLong =
            rows.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty())
        }
      }

      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new GraftV1TableScan(context, spark, t, versionAsOf, required, pushed)
          .asInstanceOf[T]
      override def description(): String =
        s"GraftScan(${t.root}, pushed=${pushed.mkString(",")})"
    }
  }
}

/** One pre-aggregated row: manifest-answered count(*)/MIN/MAX values, one
  * typed column per pushed aggregate expression. */
private object GraftMetaAggScan {
  def schemaOf(vals: Seq[(Any, org.apache.spark.sql.types.DataType)]): StructType =
    StructType(vals.zipWithIndex.map { case ((_, dt), i) =>
      org.apache.spark.sql.types.StructField(s"meta_agg_$i", dt, nullable = false) })
}
private final class GraftMetaAggScan(ctx: SQLContext,
    vals: Seq[(Any, org.apache.spark.sql.types.DataType)])
    extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = GraftMetaAggScan.schemaOf(vals)
  override def buildScan(): RDD[Row] =
    ctx.sparkContext.parallelize(Seq(Row.fromSeq(vals.map(_._1))), 1)
  override def toString: String =
    s"GraftMetaAggScan(${vals.map(_._1).mkString(",")})"
}

private final class GraftV1TableScan(ctx: SQLContext, spark: SparkSession,
    t: VersionedTable, versionAsOf: Option[Long], required: StructType,
    pushed: Array[Filter]) extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required
  // hand Spark the inner plan's own compiled rows (same move as
  // TableRelation.buildScan): no InternalRow→Row round trip per row
  override def needConversion: Boolean = false
  override def buildScan(): RDD[Row] = {
    // temporal filter values render in the MANIFEST's recorded stats zone
    // (falling back to the session zone for legacy manifests) — rendering
    // in the read session's zone would mis-prune when writer and reader
    // zones differ
    val zone = t.statsRenderZone(spark, None, versionAsOf)
    val (df, _, _) = t.readBounded(spark,
      StatsBounds.bounds(pushed, zone),
      None, versionAsOf,
      exactValues = StatsBounds.exactValues(pushed, zone),
      nullness = StatsBounds.nullness(pushed))
    df.select(required.fieldNames.toSeq.map(col): _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** Append / truncate-overwrite / predicate-overwrite as versioned commits,
  * through the V1 write fallback (`InsertableRelation` — the data lands via
  * the table's own partition-aware write path, not a per-row DSv2 writer). */
final class GraftWriteBuilder(t: VersionedTable) extends WriteBuilder
    with SupportsOverwriteV2 {

  // None = append; Some("TRUE") = full overwrite; Some(pred) = replaceWhere
  private var overwriteCond: Option[String] = None

  override def truncate(): WriteBuilder = { overwriteCond = Some("TRUE"); this }

  override def canOverwrite(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => PredicateSql.translate(p).isDefined)

  override def overwrite(predicates: Array[Predicate]): WriteBuilder = {
    val conds = predicates.toSeq.map(p => PredicateSql.translate(p).getOrElse(
      throw new UnsupportedOperationException(s"untranslatable overwrite predicate $p")))
    overwriteCond = Some(if (conds.isEmpty || conds.contains("TRUE")) "TRUE"
                         else conds.mkString(" AND "))
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        val pb = t.latestVersion().map(t.partitionByOf).getOrElse(Nil)
        overwriteCond match {
          case Some("TRUE") => t.commit(data, partitionBy = pb)
          case Some(cond) => t.replaceWhere(data, cond)
          case None =>
            if (overwrite) t.commit(data, partitionBy = pb)
            else if (t.latestVersion().isDefined) {
              t.identityOf(t.resolve()) match {
                case Some((idCol, _)) =>
                  // the engine allocates. Spark's insert resolution may pad
                  // the omitted column with NULLs — an all-null identity
                  // column counts as omitted. An explicit value refuses on
                  // GENERATED ALWAYS; on BY DEFAULT it is taken per-row
                  // (null = allocate) by appendIdentity itself.
                  data.columns.find(_.equalsIgnoreCase(idCol)) match {
                    case Some(n) if !t.identityAllowsExplicit(t.resolve()) =>
                      require(data.filter(
                          org.apache.spark.sql.functions.col(n).isNotNull).isEmpty,
                        s"$idCol is GENERATED ALWAYS AS IDENTITY on ${t.root} " +
                          "and cannot be written explicitly — omit it (or insert NULL)")
                      t.appendIdentity(data.sparkSession, data.drop(n))
                    case _ =>
                      // column absent, or BY DEFAULT (appendIdentity takes
                      // explicit ids per-row there: null = allocate)
                      t.appendIdentity(data.sparkSession, data)
                  }
                  ()
                case None => t.append(data); ()
              }
            }
            else t.commit(data, partitionBy = pb)
        }
        ()
      }
    }
  }
}

/** DSv2 `Predicate` → Spark SQL text, for the delete/overwrite conditions
  * the kernel evaluates. Conservative: any shape without an exact rendering
  * translates to None and the caller reports unsupported (correctness over
  * coverage — the extensions rule handles arbitrary conditions). */
object PredicateSql {

  def quote(name: String): String =
    if (name.matches("[a-zA-Z_][a-zA-Z0-9_]*")) name
    else "`" + name.replace("`", "``") + "`"

  def translate(p: Predicate): Option[String] = p match {
    case _: AlwaysTrue => Some("TRUE")
    case _: AlwaysFalse => Some("FALSE")
    case a: VAnd =>
      for { l <- translate(a.left); r <- translate(a.right) } yield s"($l AND $r)"
    case o: VOr =>
      for { l <- translate(o.left); r <- translate(o.right) } yield s"($l OR $r)"
    case n: VNot => translate(n.child).map(c => s"(NOT $c)")
    case _ => (p.name, p.children) match {
      case (op @ ("=" | "<>" | "<" | "<=" | ">" | ">=" | "<=>"), Array(l, r)) =>
        for { ls <- operand(l); rs <- operand(r) } yield s"($ls $op $rs)"
      case ("IS_NULL", Array(c)) => operand(c).map(x => s"($x IS NULL)")
      case ("IS_NOT_NULL", Array(c)) => operand(c).map(x => s"($x IS NOT NULL)")
      case ("IN", children) if children.length >= 2 =>
        val vals = children.tail.toSeq.map(operand)
        for {
          x <- operand(children.head)
          vs <- if (vals.exists(_.isEmpty)) None else Some(vals.flatten)
        } yield s"($x IN (${vs.mkString(", ")}))"
      case _ => None
    }
  }

  private def operand(e: VExpression): Option[String] = e match {
    case ref: NamedReference if ref.fieldNames.length == 1 =>
      Some(quote(ref.fieldNames.head))
    case l: VLiteral[_] =>
      Some(org.apache.spark.sql.catalyst.expressions.Literal(l.value, l.dataType).sql)
    case _ => None
  }
}
