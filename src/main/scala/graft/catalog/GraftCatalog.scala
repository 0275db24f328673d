package graft.catalog

import graft.table.VersionedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** DSv2 `TableCatalog` over [[VersionedTable]] roots — the SQL front door
  * the reference's users have through Delta's catalog: register once
  * (`spark.sql.catalog.graft=graft.catalog.GraftCatalog`, plus
  * `...graft.warehouse=<dir>`) and every catalog-identified statement works:
  *
  * {{{
  *   CREATE TABLE graft.ns.t (id BIGINT, k STRING) PARTITIONED BY (k)
  *   INSERT INTO graft.ns.t ...            -- append commit
  *   INSERT OVERWRITE graft.ns.t ...       -- snapshot commit
  *   SELECT * FROM graft.ns.t VERSION AS OF 3        -- time travel
  *   SELECT * FROM graft.ns.t TIMESTAMP AS OF '...'  -- mtime-based
  *   DELETE FROM graft.ns.t WHERE ...      -- SupportsDeleteV2 / kernel
  *   UPDATE / MERGE INTO                   -- via GraftExtensions
  * }}}
  *
  * Identifier → path mapping: `<warehouse>/<namespace...>/<name>`, or — the
  * Delta `delta.`/abs/path`` idiom — an identifier NAME that is an absolute
  * path addresses that table directly (`SELECT * FROM graft.`/tmp/t``).
  *
  * Scale note: the catalog holds NO state beyond the directory layout; table
  * resolution is one directory existence probe, so a 10⁵-table warehouse
  * costs nothing until a table is actually read (manifests stay lazy). */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse")).getOrElse(
      SparkSession.active.sessionState.conf.warehousePath
        .stripPrefix("file:") + s"/graft-$name"))
    Files.createDirectories(warehouse)
    ()
  }

  override def name(): String = catalogName

  /** Opt in to `ALTER TABLE ... ADD/DROP CONSTRAINT` routing here — without
    * this capability Spark rejects the statement before the catalog sees
    * it. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def defaultNamespace(): Array[String] = Array("default")

  private def isPathIdent(ident: Identifier): Boolean =
    ident.name.startsWith("/") && ident.namespace.isEmpty

  private def tablePath(ident: Identifier): Path =
    if (isPathIdent(ident)) Paths.get(ident.name)
    else (ident.namespace :+ ident.name).foldLeft(warehouse)(_.resolve(_))

  private def nsPath(ns: Array[String]): Path = ns.foldLeft(warehouse)(_.resolve(_))

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.exists(tablePath(ident).toString)

  /** Filesystem root for `ident` — the bridge that lets the maintenance
    * verbs ([[graft.table.TableSql]]) address catalog tables by NAME
    * (`OPTIMIZE graft.default.t`) instead of only by path. */
  def pathOf(ident: Identifier): String = tablePath(ident).toString

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    if (!VersionedTable.exists(p.toString)) {
      // metadata-table fallback (graft.ns.t.files|partitions|history): only
      // on a MISS — a real table named `files` always wins — and only when
      // the prefix names a real table
      if (ident.namespace.nonEmpty &&
          GraftMetadataTable.Kinds(ident.name.toLowerCase(java.util.Locale.ROOT))) {
        val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
        val pp = tablePath(parent)
        if (VersionedTable.exists(pp.toString))
          return new GraftMetadataTable(VersionedTable(pp.toString),
            ident.toString, ident.name.toLowerCase(java.util.Locale.ROOT))
      }
      // persistent-view fallback: Spark 4.1 has no V2 view READ resolution,
      // so a stored view serves as a read-only table over its re-analyzed
      // body (see GraftViewTable — this is also what makes SHOW
      // TBLPROPERTIES / DESCRIBE work on views for free)
      if (viewExists(ident)) return new GraftViewTable(loadView(ident), ident.toString)
      throw new NoSuchTableException(ident)
    }
    new GraftTable(VersionedTable(p.toString), ident.toString, versionAsOf = None)
  }

  /** `VERSION AS OF <v>` — Spark hands the version text through verbatim. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!VersionedTable.exists(p.toString)) throw new NoSuchTableException(ident)
    val t = VersionedTable(p.toString)
    new GraftTable(t, ident.toString, versionAsOf = Some(version.toLong))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    if (!VersionedTable.exists(p.toString)) throw new NoSuchTableException(ident)
    val t = VersionedTable(p.toString)
    new GraftTable(t, ident.toString,
      versionAsOf = Some(t.resolveAsOfTimestamp(timestamp / 1000L)))
  }

  /** The Column[]-based CREATE: detects `GENERATED ALWAYS AS IDENTITY`
    * specs and `GENERATED ALWAYS AS (expr)` generation expressions (the
    * StructType overload cannot carry either), creates the table, then
    * stamps the identity declaration into the manifest — after which the
    * INSERT path allocates ids through [[VersionedTable.appendIdentity]]
    * and explicit writes of the column refuse. Generation expressions land
    * as [[VersionedTable.GenerationExprKey]] schema metadata — the same
    * frame `commit(generatedColumns = ...)` records — so every later write
    * funnel recomputes them (Delta's DDL shape,
    * `day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))`). */
  /** Identity-column specs of a Column[] DDL, validated. */
  private def identityCols(
      columns: Array[org.apache.spark.sql.connector.catalog.Column])
      : Array[org.apache.spark.sql.connector.catalog.Column] = {
    val idCols = columns.filter(_.identityColumnSpec() != null)
    require(idCols.length <= 1,
      s"graft tables support at most one identity column, got ${idCols.map(_.name).mkString(", ")}")
    idCols.foreach { c =>
      val s = c.identityColumnSpec()
      require(s.getStart == 1 && s.getStep == 1,
        "graft identity columns support START WITH 1 INCREMENT BY 1 only")
      // isAllowExplicitInsert = GENERATED BY DEFAULT (both Delta variants
      // supported; the mode rides the manifest's identity declaration)
    }
    idCols
  }

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val idCols = identityCols(columns)
    // CatalogV2Util.v2ColumnsToStructType is private[sql]; the mapping is
    // mechanical (identity/default specs are handled above, not in the
    // schema; generation expressions become in-schema metadata)
    val schema = schemaFromColumns(columns)
    val created = createTable(ident, schema, partitions, properties)
    idCols.foreach { c =>
      VersionedTable(tablePath(ident).toString)
        .enableIdentity(SparkSession.active, c.name(),
          allowExplicit = c.identityColumnSpec().isAllowExplicitInsert)
    }
    created
  }

  private def partitionNames(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft tables support identity partitioning only, got $other")
    }

  // -- atomic CREATE OR REPLACE (StagingTableCatalog) -------------------------

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    staged(ident, info, mustNotExist = true, mustExist = false)
  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    staged(ident, info, mustNotExist = false, mustExist = true)
  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    staged(ident, info, mustNotExist = false, mustExist = false)

  /** Atomic [CREATE OR] REPLACE TABLE [AS SELECT]: the staged writer's
    * rows are HELD and published as ONE versioned overwrite commit at
    * `commitStagedChanges` — readers never see a dropped table (the
    * non-staging fallback is drop-then-create), an abort or failure
    * before the commit leaves the table byte-identical, and every prior
    * version stays time-travelable (Delta's REPLACE keeps history).
    * CHECK constraints carry through the overwrite commit (they describe
    * the table, and a replace whose data violates them REFUSES — drop the
    * constraint first); declared identity re-arms against the new data. */
  private def staged(ident: Identifier, info: TableInfo,
      mustNotExist: Boolean, mustExist: Boolean): StagedTable = {
    if (mustNotExist && tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (mustExist && !tableExists(ident)) throw new NoSuchTableException(ident)
    if (viewExists(ident)) throw new TableAlreadyExistsException(ident)
    Option(info.properties().get(TableCatalog.PROP_LOCATION)).foreach { loc =>
      val resolved = tablePath(ident).toString
      if (Paths.get(loc.stripPrefix("file:")).toString != resolved)
        throw new UnsupportedOperationException(
          s"graft tables live at <warehouse>/<namespace>/<name> ($resolved); " +
            s"LOCATION '$loc' cannot be honored")
    }
    val idCols = identityCols(info.columns())
    val userProps = info.properties().asScala.toMap -- Seq(
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_COMMENT)
    new GraftStagedTable(ident, tablePath(ident).toString,
      schemaFromColumns(info.columns()), partitionNames(info.partitions()),
      userProps,
      idCols.map(c => c.name() -> c.identityColumnSpec().isAllowExplicitInsert).toSeq)
  }

  /** Column[] → StructType, carrying generation expressions and DEFAULTs
    * as the in-schema metadata every write funnel consumes. */
  private def schemaFromColumns(
      columns: Array[org.apache.spark.sql.connector.catalog.Column]): StructType =
    StructType(columns.map { c =>
      val base = org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)
      val commented = Option(c.comment).map(base.withComment).getOrElse(base)
      val generated = Option(c.generationExpression()).fold(commented)(g =>
        commented.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(commented.metadata)
          .putString(VersionedTable.GenerationExprKey, g).build()))
      // `c BIGINT DEFAULT <expr>`: record the SQL text under Spark's own
      // CURRENT_DEFAULT key — write funnels fill omitted columns, the
      // analyzer resolves DEFAULT keywords, DESCRIBE reports it
      Option(c.defaultValue()).fold(generated) { d =>
        require(c.generationExpression() == null,
          s"column ${c.name} cannot be both GENERATED and DEFAULTed")
        val sql = Option(d.getSql).getOrElse(throw new UnsupportedOperationException(
          s"column ${c.name}: only SQL-text defaults are supported"))
        generated.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(generated.metadata)
          .putString(VersionedTable.CurrentDefaultKey, sql).build())
      }
    })

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // a stored VIEW occupies the name too (the collision guard is
    // two-directional — createView/replaceView already check tableExists)
    if (viewExists(ident)) throw new TableAlreadyExistsException(ident)
    // CREATE TABLE ... LOCATION: the catalog's only state is the directory
    // layout, so a table materialized away from <warehouse>/<ns>/<name>
    // could never be resolved again by its identifier. Reject rather than
    // silently materializing at the default path (every other unsupported
    // feature here throws too); external roots are addressed directly via
    // the path-identifier idiom instead.
    Option(properties.get(TableCatalog.PROP_LOCATION)).foreach { loc =>
      val resolved = tablePath(ident).toString
      if (Paths.get(loc.stripPrefix("file:")).toString != resolved)
        throw new UnsupportedOperationException(
          s"graft tables live at <warehouse>/<namespace>/<name> ($resolved); " +
            s"LOCATION '$loc' cannot be honored — address an external root " +
            "directly with a path identifier: SELECT * FROM graft.`" + loc + "`")
    }
    val partitionBy = partitionNames(partitions)
    val spark = SparkSession.active
    val t = VersionedTable(tablePath(ident).toString)
    // version 0: an empty snapshot carrying the declared schema + layout —
    // the same "empty file list is a valid version" rule the format already
    // has, so readers and appends work immediately
    t.commit(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      partitionBy = partitionBy)
    val userProps = properties.asScala.toMap -- Seq(
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_COMMENT)
    if (userProps.nonEmpty) t.setProperties(userProps)
    new GraftTable(t, ident.toString, versionAsOf = None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = VersionedTable(tablePath(ident).toString)
    changes.foreach {
      case set: TableChange.SetProperty => t.setProperties(Map(set.property -> set.value))
      case rm: TableChange.RemoveProperty => t.setProperties(Map(rm.property -> null))
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"graft tables support top-level column adds only, got ${add.fieldNames.mkString(".")}")
        // metadata-only additive widen (also the hook Spark's own
        // MERGE WITH SCHEMA EVOLUTION resolution drives)
        t.evolveSchema(Seq(org.apache.spark.sql.types.StructField(
          add.fieldNames.head, add.dataType, nullable = true)))
        ()
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"graft tables support top-level column renames only, got ${ren.fieldNames.mkString(".")}")
        t.renameColumn(ren.fieldNames.head, ren.newName)
        ()
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"graft tables support top-level column drops only, got ${del.fieldNames.mkString(".")}")
        if (del.ifExists != null && del.ifExists &&
            !t.latestVersion().flatMap(t.schemaOf)
              .exists(_.fieldNames.contains(del.fieldNames.head))) ()
        else { t.dropColumn(del.fieldNames.head); () }
      case add: TableChange.AddConstraint => add.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          // the kernel validates against LIVE rows and refuses a constraint
          // existing data violates — the ADD CONSTRAINT contract
          t.addConstraint(SparkSession.active, c.name, c.predicateSql)
          ()
        case other => throw new UnsupportedOperationException(
          s"graft tables enforce CHECK constraints only, got ${other.toDDL}")
      }
      case drop: TableChange.DropConstraint =>
        if (drop.ifExists && !VersionedTable(tablePath(ident).toString)
              .latestVersion().exists(v => t.constraintsOf(v).contains(drop.name)))
          ()
        else { t.dropConstraint(drop.name); () }
      case ty: TableChange.UpdateColumnType =>
        require(ty.fieldNames.length == 1,
          s"graft tables support top-level type changes only, got " +
            ty.fieldNames.mkString("."))
        // metadata-only lossless widening (kernel refuses anything else)
        t.alterColumnType(ty.fieldNames.head, ty.newDataType)
        ()
      case d: TableChange.UpdateColumnDefaultValue =>
        require(d.fieldNames.length == 1,
          s"graft tables support top-level column defaults only, got " +
            d.fieldNames.mkString("."))
        // SET DEFAULT carries the SQL text; DROP DEFAULT arrives as an
        // empty/absent default — both route to the metadata-only verb
        val sql = Option(d.newCurrentDefault()).flatMap(v => Option(v.getSql))
          .orElse(Option(d.newDefaultValue()).filter(_.nonEmpty))
        t.setColumnDefault(SparkSession.active, d.fieldNames.head, sql)
        ()
      case nul: TableChange.UpdateColumnNullability =>
        require(nul.fieldNames.length == 1,
          s"graft tables support top-level nullability changes only, got " +
            nul.fieldNames.mkString("."))
        // SET NOT NULL validates live rows first (kernel contract);
        // DROP NOT NULL is metadata-only
        t.setColumnNullability(SparkSession.active, nul.fieldNames.head, nul.nullable)
        ()
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change $other is not supported on graft tables " +
          "(only properties, additive columns, nullability, and CHECK constraints)")
    }
    new GraftTable(t, ident.toString, versionAsOf = None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    if (!VersionedTable.exists(p.toString)) false
    else { deleteRecursively(p); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val to = tablePath(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(tablePath(oldIdent), to)
    ()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    Option(dir.toFile.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(n => VersionedTable.exists(dir.resolve(n).toString))
      .sorted.map(n => Identifier.of(namespace, n)).toArray
  }

  // -- namespaces: directories under the warehouse ---------------------------

  override def listNamespaces(): Array[Array[String]] =
    Option(warehouse.toFile.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(n => Files.isDirectory(warehouse.resolve(n)) &&
        !VersionedTable.exists(warehouse.resolve(n).toString))
      .sorted.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || Files.isDirectory(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = nsPath(namespace)
    if (!cascade && Option(dir.toFile.list()).exists(_.nonEmpty))
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    deleteRecursively(dir); true
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Option(p.toFile.list()).toSeq.flatten.foreach(n => deleteRecursively(p.resolve(n)))
    Files.deleteIfExists(p)
    ()
  }

  // ---- persistent views (ViewCatalog) --------------------------------------
  //
  // Views persist as one JSON file each under `<warehouse>/_views/<ns...>/
  // <name>.view.json` — the same no-state-beyond-the-directory contract as
  // tables (a 10⁵-view warehouse costs one existence probe per resolution).
  // Spark itself analyzes the stored SQL at READ time against the view's
  // recorded (currentCatalog, currentNamespace), so views compose with every
  // engine surface with no shim — including TIME TRAVEL in the body: a view
  // over `VERSION AS OF <v>` is ALLOWED deliberately (decided round 15) and
  // serves the PINNED snapshot forever, because that is what the text says —
  // a named audit snapshot ("q1_2026_close") is exactly the compliance shape
  // the reference's users build on Delta, and GraftCatalogSpec pins the
  // behavior so it cannot drift into head-tracking silently.

  private val ViewSuffix = ".view.json"
  private val viewMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def viewPath(ident: Identifier): Path =
    ident.namespace.foldLeft(warehouse.resolve("_views"))(_.resolve(_))
      .resolve(ident.name + ViewSuffix)

  override def viewExists(ident: Identifier): Boolean =
    Files.isRegularFile(viewPath(ident))

  override def listViews(namespace: String*): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse.resolve("_views"))(_.resolve(_))
    if (!Files.isDirectory(dir)) return Array.empty
    Option(dir.toFile.list()).toSeq.flatten.sorted
      .filter(_.endsWith(ViewSuffix))
      .map(n => Identifier.of(namespace.toArray, n.stripSuffix(ViewSuffix)))
      .toArray
  }

  override def loadView(ident: Identifier): View = {
    if (!viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val n = viewMapper.readTree(Files.readAllBytes(viewPath(ident)))
    def arr(f: String): Array[String] = {
      val a = n.get(f)
      (0 until a.size()).map(a.get(_).asText()).toArray
    }
    GraftView(ident.toString, n.get("sql").asText(),
      n.get("currentCatalog").asText(), arr("currentNamespace"),
      org.apache.spark.sql.types.DataType.fromJson(n.get("schemaJson").asText())
        .asInstanceOf[StructType],
      arr("queryColumnNames"), arr("columnAliases"), arr("columnComments"),
      n.get("properties").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
  }

  override def createView(info: ViewInfo): View = {
    val ident = info.ident
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    writeView(ident, GraftView(ident.toString, info.sql, info.currentCatalog,
      info.currentNamespace, info.schema,
      Option(info.queryColumnNames).getOrElse(Array.empty),
      Option(info.columnAliases).getOrElse(Array.empty),
      Option(info.columnComments).getOrElse(Array.empty),
      Option(info.properties).map(_.asScala.toMap).getOrElse(Map.empty)))
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident
    if (!viewExists(ident) && !orCreate)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    writeView(ident, GraftView(ident.toString, info.sql, info.currentCatalog,
      info.currentNamespace, info.schema,
      Option(info.queryColumnNames).getOrElse(Array.empty),
      Option(info.columnAliases).getOrElse(Array.empty),
      Option(info.columnComments).getOrElse(Array.empty),
      Option(info.properties).map(_.asScala.toMap).getOrElse(Map.empty)))
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val v = loadView(ident).asInstanceOf[GraftView]
    val props = changes.foldLeft(v.props) { (m, c) =>
      c match {
        case s: ViewChange.SetProperty => m + (s.property() -> s.value())
        case r: ViewChange.RemoveProperty => m - r.property()
        case other => throw new IllegalArgumentException(
          s"unsupported view change $other")
      }
    }
    writeView(ident, v.copy(props = props))
  }

  override def dropView(ident: Identifier): Boolean =
    Files.deleteIfExists(viewPath(ident))

  override def renameView(from: Identifier, to: Identifier): Unit = {
    if (!viewExists(from))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    if (viewExists(to))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(to)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    Files.createDirectories(viewPath(to).getParent)
    Files.move(viewPath(from), viewPath(to))
    ()
  }

  /** Atomic persist: write a temp sibling, then move into place — a reader
    * never sees a half-written view definition. */
  private def writeView(ident: Identifier, v: GraftView): View = {
    val p = viewPath(ident)
    Files.createDirectories(p.getParent)
    val root = viewMapper.createObjectNode()
    root.put("sql", v.viewSql)
    root.put("currentCatalog", v.curCatalog)
    root.put("schemaJson", v.viewSchema.json)
    def arr(f: String, xs: Array[String]): Unit = {
      val a = root.putArray(f); xs.foreach(a.add); ()
    }
    arr("currentNamespace", v.curNamespace)
    arr("queryColumnNames", v.qCols)
    arr("columnAliases", v.aliases)
    arr("columnComments", v.comments)
    val pn = root.putObject("properties")
    v.props.toSeq.sortBy(_._1).foreach { case (k, x) => pn.put(k, x) }
    val tmp = p.getParent.resolve(p.getFileName.toString + s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, viewMapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    try Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    v
  }
}

/** A persisted view definition (see GraftCatalog's view section). */
private final case class GraftView(viewName: String, viewSql: String,
    curCatalog: String, curNamespace: Array[String],
    viewSchema: StructType, qCols: Array[String], aliases: Array[String],
    comments: Array[String], props: Map[String, String]) extends View {
  override def name(): String = viewName
  override def query(): String = viewSql
  override def currentCatalog(): String = curCatalog
  override def currentNamespace(): Array[String] = curNamespace
  override def schema(): StructType = viewSchema
  override def queryColumnNames(): Array[String] = qCols
  override def columnAliases(): Array[String] = aliases
  override def columnComments(): Array[String] = comments
  override def properties(): java.util.Map[String, String] = props.asJava
}

/** The staged face of [CREATE OR] REPLACE TABLE [AS SELECT] — see
  * [[GraftCatalog.staged]]. The CTAS writer's frame is captured (V1 write
  * path) and nothing touches the table root until [[commitStagedChanges]],
  * which publishes one versioned overwrite: abort = no-op, commit = one
  * CAS-protected snapshot, history retained. */
private final class GraftStagedTable(
    ident: Identifier,
    root: String,
    declared: StructType,
    partitionBy: Seq[String],
    userProps: Map[String, String],
    identitySpecs: Seq[(String, Boolean)])
    extends StagedTable with SupportsWrite {
  import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
  import org.apache.spark.sql.sources.InsertableRelation

  private var stagedData: Option[org.apache.spark.sql.DataFrame] = None

  override def name(): String = ident.toString
  override def schema(): StructType = declared
  override def partitioning(): Array[Transform] =
    partitionBy.map(org.apache.spark.sql.connector.expressions.Expressions.identity).toArray
  override def properties(): java.util.Map[String, String] = userProps.asJava
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // a staged CTAS/RTAS plans as truncate-shaped OverwriteByExpression:
    // accept any overwrite condition — the whole table is being defined,
    // the captured frame IS the table's entire next state
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsOverwriteV2 {
      override def overwrite(
          filters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
          : WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
            stagedData = Some(data)
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    val spark = SparkSession.active
    val t = VersionedTable(root)
    val df = stagedData match {
      case Some(d) =>
        // type-pin the query's output to the DECLARED columns, carrying the
        // declared metadata (generation/DEFAULT expressions) into the
        // recorded schema
        d.select(declared.fields.map(f =>
          org.apache.spark.sql.functions.col(f.name)
            .cast(f.dataType).as(f.name, f.metadata)).toIndexedSeq: _*)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
    }
    // REPLACE must not leak the replaced table's state: prior TBLPROPERTIES
    // absent from the new definition are removed (null value = removal in
    // setProperties), and an identity declaration the new definition does
    // not carry is reset on the overwrite commit itself — otherwise e.g.
    // enableChangeDataFeed or an identity high-water silently survive into
    // a table the user just redefined from scratch.
    //
    // The property swap runs BEFORE the overwrite commit: the commit itself
    // must execute under the NEW definition's properties — the replaced
    // table's enableChangeDataFeed must not decide CDF capture for the
    // replace commit, its checkpointInterval must not fire an auto-
    // checkpoint mid-replace, and crucially its appendOnly=true must not
    // refuse the REPLACE the user issued precisely to drop it. A crash in
    // the window between the two leaves the OLD data under the NEW
    // properties — a visibly-torn REPLACE to re-run, rather than a
    // completed-looking one silently carrying stale write behavior.
    val stale = t.properties.keySet -- userProps.keySet
    val propEdits = stale.map(_ -> (null: String)).toMap ++ userProps
    if (propEdits.nonEmpty) t.setProperties(propEdits)
    t.commit(df, partitionBy = partitionBy, resetIdentity = identitySpecs.isEmpty)
    identitySpecs.foreach { case (c, allowExplicit) =>
      t.enableIdentity(spark, c, allowExplicit = allowExplicit)
    }
  }

  override def abortStagedChanges(): Unit = () // nothing was published
}
