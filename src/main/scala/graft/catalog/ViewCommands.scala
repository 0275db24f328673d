package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import scala.jdk.CollectionConverters._

/** SQL surface for [[GraftCatalog]]'s persistent views.
  *
  * Spark 4.1 ships the `ViewCatalog` CONNECTOR interface but no SQL path to
  * it: `ResolveSessionCatalog` hard-throws MISSING_CATALOG_ABILITY for any
  * view DDL whose identifier resolves outside the session catalog (verified
  * against the 4.1.2 bytecode — there is no ViewCatalog dispatch at all),
  * and the analyzer has no V2 view READ resolution either. So the engine
  * provides both halves itself:
  *
  *  - DDL: this rule is injected into the HINT-resolution batch (the only
  *    extension point that runs BEFORE `ResolveSessionCatalog`) and rewrites
  *    CREATE/DROP/SHOW/ALTER VIEW statements whose identifier addresses a
  *    [[GraftCatalog]] into the leaf commands below — the same
  *    LeafRunnableCommand shape as the DML kernel commands.
  *  - READ: `GraftCatalog.loadTable` serves a missed identifier that names a
  *    stored view as a read-only [[GraftViewTable]], which analyzes the
  *    stored SQL text at resolution time (fresh schema, SQL-standard text
  *    re-expansion — a view over `VERSION AS OF` therefore serves its pinned
  *    snapshot forever, the round-15 decision pinned in GraftCatalogSpec)
  *    and hands Spark the analyzed plan's own compiled rows through the
  *    V1Scan bridge. Nested views resolve recursively with a depth cap. */
case class GraftViewDdlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def cm = session.sessionState.catalogManager

  private def asGraft(name: String): Option[GraftCatalog] =
    try cm.catalog(name) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** Map a raw multipart identifier onto (graft catalog, view identifier,
    * explicitly-qualified?): explicit `graft.ns.v`, or relative under a
    * graft CURRENT catalog. Spark's own convention for relative names: a
    * MULTI-part name IS the namespace-qualified identifier (`default.v`
    * under `USE graft` means graft.default.v); only a single-part name
    * takes the current namespace. */
  private def viewIdent(parts: Seq[String])
      : Option[(GraftCatalog, Identifier, Boolean)] =
    if (parts.length >= 2 && asGraft(parts.head).isDefined)
      asGraft(parts.head).map { g =>
        val rest = parts.tail
        (g, Identifier.of(rest.init.toArray, rest.last), true)
      }
    else cm.currentCatalog match {
      case g: GraftCatalog if parts.nonEmpty =>
        val full =
          if (parts.length == 1) cm.currentNamespace.toSeq ++ parts else parts
        Some((g, Identifier.of(full.init.toArray, full.last), false))
      case _ => None
    }

  /** A DDL child rewrites when the identifier is EXPLICITLY catalog-
    * qualified (a temp view can never carry a catalog prefix — our error
    * vocabulary should own the statement even on a miss), or when the
    * stored view actually exists; a RELATIVE name with no stored view
    * falls through so Spark's own temp-view machinery keeps handling it. */
  private def owned(parts: Seq[String]): Option[(GraftCatalog, Identifier)] =
    viewIdent(parts).collect {
      case (g, id, explicit) if explicit || g.viewExists(id) => (g, id)
    }

  private def partsOf(child: LogicalPlan): Option[Seq[String]] = child match {
    case u: UnresolvedIdentifier => Some(u.nameParts)
    case u: UnresolvedView => Some(u.multipartIdentifier)
    case u: UnresolvedTableOrView => Some(u.multipartIdentifier)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // CREATE VIEW is a persistent-view statement by grammar (temp views
    // parse to their own nodes), so any graft-resolved identifier is ours
    case c @ CreateView(child, userCols, comment, _, props, originalText,
        query, allowExisting, replace, _) =>
      partsOf(child).flatMap(viewIdent).map { case (g, id, _) =>
        GraftCreateViewCommand(g, id, userCols, comment, props,
          originalText, query, allowExisting, replace): LogicalPlan
      }.getOrElse(c)
    case d @ DropView(child, ifExists) =>
      partsOf(child).flatMap(owned).map { case (g, id) =>
        GraftDropViewCommand(g, id, ifExists): LogicalPlan
      }.getOrElse(d)
    case s @ ShowViews(nsChild, pattern, output) =>
      (nsChild match {
        case UnresolvedNamespace(parts, _)
            if parts.nonEmpty && asGraft(parts.head).isDefined =>
          Some((asGraft(parts.head).get, parts.tail))
        case UnresolvedNamespace(parts, _) => cm.currentCatalog match {
          // `SHOW VIEWS IN default` under USE graft
          case g: GraftCatalog => Some((g, parts))
          case _ => None
        }
        // bare `SHOW VIEWS` parses to the CurrentNamespace marker
        case org.apache.spark.sql.catalyst.analysis.CurrentNamespace =>
          cm.currentCatalog match {
            case g: GraftCatalog => Some((g, cm.currentNamespace.toSeq))
            case _ => None
          }
        case _ => None
      }).map { case (g, ns) =>
        GraftShowViewsCommand(g, ns, pattern, output): LogicalPlan
      }.getOrElse(s)
    case sp @ SetViewProperties(child, props) =>
      partsOf(child).flatMap(owned).map { case (g, id) =>
        GraftAlterViewPropsCommand(g, id, set = props, unset = Nil): LogicalPlan
      }.getOrElse(sp)
    case up @ UnsetViewProperties(child, keys, _) =>
      partsOf(child).flatMap(owned).map { case (g, id) =>
        GraftAlterViewPropsCommand(g, id, set = Map.empty, unset = keys): LogicalPlan
      }.getOrElse(up)
    case av @ AlterViewAs(child, originalText, query) =>
      partsOf(child).flatMap(owned).map { case (g, id) =>
        GraftAlterViewAsCommand(g, id, originalText, query): LogicalPlan
      }.getOrElse(av)
    case rt @ RenameTable(child, newName, true) =>
      (for {
        parts <- partsOf(child)
        from <- owned(parts)
      } yield {
        val toParts =
          if (newName.length >= 2 && asGraft(newName.head).contains(from._1))
            newName.tail
          else newName
        val to =
          if (toParts.length >= 2)
            Identifier.of(toParts.init.toArray, toParts.last)
          else Identifier.of(from._2.namespace, toParts.last)
        GraftRenameViewCommand(from._1, from._2, to): LogicalPlan
      }).getOrElse(rt)
  }
}

/** CREATE [OR REPLACE] VIEW — analyzes the body ONCE for the recorded
  * schema/column names (the stored definition is the TEXT; readers
  * re-analyze it, SQL-standard text expansion). */
case class GraftCreateViewCommand(catalog: GraftCatalog, ident: Identifier,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    props: Map[String, String], originalText: Option[String],
    query: LogicalPlan, allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val text = originalText.getOrElse(throw new UnsupportedOperationException(
      "CREATE VIEW on a graft catalog needs the view's SQL text"))
    if (allowExisting && catalog.viewExists(ident)) return Nil
    val analyzed = sparkSession.sessionState.executePlan(query).analyzed
    val qCols = analyzed.schema.fieldNames
    require(userCols.isEmpty || userCols.length == qCols.length,
      s"view column list has ${userCols.length} names for ${qCols.length} columns")
    val aliases = if (userCols.isEmpty) Array.empty[String]
                  else userCols.map(_._1).toArray
    val comments = if (userCols.isEmpty) Array.empty[String]
                   else userCols.map(_._2.orNull).toArray
    val schema =
      if (aliases.isEmpty) analyzed.schema
      else org.apache.spark.sql.types.StructType(
        analyzed.schema.fields.zip(aliases).map { case (f, a) => f.copy(name = a) })
    val cmAll = sparkSession.sessionState.catalogManager
    val info = new ViewInfo(ident, text, cmAll.currentCatalog.name(),
      cmAll.currentNamespace, schema, qCols, aliases, comments,
      (props ++ comment.map("comment" -> _)).asJava)
    if (replace) catalog.replaceView(info, true) else catalog.createView(info)
    Nil
  }
}

case class GraftDropViewCommand(catalog: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

case class GraftShowViewsCommand(catalog: GraftCatalog, namespace: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val ns = if (namespace.nonEmpty) namespace else Seq("default")
    catalog.listViews(ns: _*).toSeq
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name), p).nonEmpty))
      .map(id => Row(ns.mkString("."), id.name, false))
  }
}

case class GraftAlterViewPropsCommand(catalog: GraftCatalog, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val changes = set.toSeq.sortBy(_._1)
      .map { case (k, v) => ViewChange.setProperty(k, v) } ++
      unset.map(ViewChange.removeProperty)
    catalog.alterView(ident, changes: _*)
    Nil
  }
}

case class GraftAlterViewAsCommand(catalog: GraftCatalog, ident: Identifier,
    originalText: String, query: LogicalPlan) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val prior = catalog.loadView(ident) // throws NoSuchViewException on a miss
    val analyzed = sparkSession.sessionState.executePlan(query).analyzed
    val cmAll = sparkSession.sessionState.catalogManager
    val info = new ViewInfo(ident, originalText, cmAll.currentCatalog.name(),
      cmAll.currentNamespace, analyzed.schema, analyzed.schema.fieldNames,
      Array.empty, Array.empty, prior.properties())
    catalog.replaceView(info, false)
    Nil
  }
}

case class GraftRenameViewCommand(catalog: GraftCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Nil
  }
}

/** The READ face of a stored view: `loadTable` returns this for an
  * identifier that names a view, and the scan hands Spark the re-analyzed
  * body's own compiled rows (V1Scan bridge, `needConversion = false` — the
  * same zero-copy move as the table scans). Read-only by capability:
  * INSERT/DELETE against a view refuse in Spark's own vocabulary. */
private[catalog] final class GraftViewTable(v: View, ident: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability

  private lazy val df: org.apache.spark.sql.DataFrame =
    GraftViewTable.resolve(SparkSession.active, v)

  override def name(): String = ident
  override def schema(): org.apache.spark.sql.types.StructType = df.schema
  override def properties(): java.util.Map[String, String] = v.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    val frame = df
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.V1Scan {
          override def readSchema(): org.apache.spark.sql.types.StructType =
            frame.schema
          override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
              with org.apache.spark.sql.sources.TableScan](
              context: org.apache.spark.sql.SQLContext): T =
            new org.apache.spark.sql.sources.BaseRelation
                with org.apache.spark.sql.sources.TableScan {
              override def sqlContext: org.apache.spark.sql.SQLContext = context
              override def schema: org.apache.spark.sql.types.StructType = frame.schema
              override def needConversion: Boolean = false
              override def buildScan(): org.apache.spark.rdd.RDD[Row] =
                frame.queryExecution.toRdd.asInstanceOf[org.apache.spark.rdd.RDD[Row]]
            }.asInstanceOf[T]
        }
    }
  }
}

private[catalog] object GraftViewTable {
  /** Spark's own default `maxNestedViewDepth` — a view body referencing
    * another view re-enters [[resolve]]; a cycle would recurse forever. */
  private val MaxDepth = 100
  private val depth = ThreadLocal.withInitial[Integer](() => 0)

  /** Schema-drift policy property (ALTER VIEW ... SET TBLPROPERTIES).
    * Delta's WITH SCHEMA BINDING / COMPENSATION / EVOLUTION clause surface,
    * carried as a view property since Spark's parser has no clause to hang
    * it on. DECIDED (round 15 close): the DEFAULT is EVOLUTION — stored
    * text re-analyzed at every resolution, the view's schema following the
    * base tables, which is what SQL-standard text expansion already does
    * and what every other face of this engine assumed. The other two modes
    * are consumer protection, opt-in per view:
    *  - `compensation`: the view keeps serving its STORED schema — stored
    *    columns selected by (case-insensitive) name from the fresh body
    *    and cast back to their stored types; columns the base gained are
    *    ignored; a stored column the base LOST refuses loudly.
    *  - `binding`: any drift refuses — the fresh body must produce exactly
    *    the stored (name, type) sequence (nullability ignored; STRICTER
    *    than Delta's binding, which still tolerates safe up-casts — a
    *    deliberate simplification, stated here so it can't pass as an
    *    accident).
    * The recorded baseline for both modes is the schema captured at
    * CREATE/REPLACE/ALTER-AS time (writeView's schemaJson). */
  private[catalog] val SchemaModeKey = "graft.schemaMode"

  def resolve(spark: SparkSession, v: View): org.apache.spark.sql.DataFrame = {
    if (depth.get() >= MaxDepth)
      throw new IllegalStateException(
        s"view resolution exceeded depth $MaxDepth at ${v.name()} — " +
          "circular view reference?")
    depth.set(depth.get() + 1)
    try {
      // analyze the stored TEXT under the stored (catalog, namespace) — the
      // context captured at creation, SQL-standard expansion. Without the
      // switch, a body with relative names silently resolves against
      // whatever catalog the READER happens to have current.
      val cm = spark.sessionState.catalogManager
      val prevCat = cm.currentCatalog.name()
      val prevNs = cm.currentNamespace
      val storedCat = Option(v.currentCatalog()).filter(_.nonEmpty)
      val storedNs = Option(v.currentNamespace()).filter(_.nonEmpty)
      val switchCat = storedCat.exists(_ != prevCat)
      val switchNs = storedNs.exists(!_.sameElements(prevNs))
      val base =
        if (!switchCat && !switchNs) spark.sql(v.query())
        else try {
          if (switchCat) cm.setCurrentCatalog(storedCat.get)
          storedNs.foreach(cm.setCurrentNamespace)
          spark.sql(v.query()) // Dataset.ofRows analyzes eagerly, inside the switch
        } finally {
          // setCurrentCatalog resets the namespace to the catalog default,
          // so the catalog must be restored FIRST
          if (switchCat) cm.setCurrentCatalog(prevCat)
          cm.setCurrentNamespace(prevNs)
        }
      val aliases = v.columnAliases()
      val aliased =
        if (aliases != null && aliases.nonEmpty) base.toDF(aliases.toSeq: _*)
        else base
      applySchemaMode(v, aliased)
    } finally depth.set(depth.get() - 1)
  }

  /** Enforce [[SchemaModeKey]] on the freshly-analyzed body. */
  private def applySchemaMode(v: View,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val mode = Option(v.properties().get(SchemaModeKey))
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("evolution")
    // (lowercased name, nullability-free type rendering): drift is judged on
    // what a consumer can observe through the schema, not on nullability
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f =>
        (f.name.toLowerCase(java.util.Locale.ROOT), f.dataType.sql))
    mode match {
      case "evolution" => df
      case "compensation" =>
        val out = df.schema
        val cols = v.schema().fields.map { f =>
          val live = out.fields.find(_.name.equalsIgnoreCase(f.name)).getOrElse(
            throw new IllegalStateException(
              s"view ${v.name()} (graft.schemaMode=compensation): stored column " +
                s"'${f.name}' no longer exists in the view body's output " +
                s"(${out.fieldNames.mkString(", ")}) — re-create the view or " +
                "switch it to evolution"))
          df(s"`${live.name.replace("`", "``")}`").cast(f.dataType).as(f.name)
        }
        df.select(cols.toIndexedSeq: _*)
      case "binding" =>
        val got = shape(df.schema)
        val want = shape(v.schema())
        if (got != want) throw new IllegalStateException(
          s"view ${v.name()} (graft.schemaMode=binding): the body's schema " +
            s"drifted from the stored definition — stored " +
            s"${want.map { case (n, t) => s"$n $t" }.mkString("(", ", ", ")")}, " +
            s"now ${got.map { case (n, t) => s"$n $t" }.mkString("(", ", ", ")")} — " +
            "re-create the view to accept the drift or switch it to " +
            "compensation/evolution")
        df
      case other => throw new IllegalArgumentException(
        s"view ${v.name()}: unknown $SchemaModeKey '$other' " +
          "(expected evolution, compensation, or binding)")
    }
  }
}
