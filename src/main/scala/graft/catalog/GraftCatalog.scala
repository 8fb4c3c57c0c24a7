package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 `TableCatalog` over graft Delta tables, backed by a catalog
  * root DIRECTORY: table `graft.db.t` lives at `<root>/db/t` (a
  * namespace is a directory, a table is a directory holding a
  * `_delta_log`). Register it like any Spark catalog:
  *
  *   spark.sql.catalog.graft       = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.root  = /lake/catalog
  *
  * and the whole existing surface becomes NAME-addressed:
  * `CREATE TABLE graft.db.t (...)`, `SELECT * FROM graft.db.t`
  * (incl. `VERSION AS OF`), `spark.table("graft.db.t")`,
  * `INSERT/DELETE/UPDATE/MERGE/OPTIMIZE/VACUUM ... graft.db.t` (the
  * GraftSqlDml rewrites resolve names through [[GraftCatalogPaths]]),
  * `SHOW TABLES IN graft.db`, `DESCRIBE`, the ALTER family, `DROP
  * TABLE`. Real pipelines name tables; the name→directory mapping
  * means a lake reorganization is one `renameTable`/namespace move,
  * not a rewrite of every query's path literal.
  *
  * EXTERNAL tables (`CREATE TABLE ... LOCATION '/elsewhere'`) are a
  * one-line pointer file `_graft_location` under the catalog
  * directory; everything else reads/writes the pointed-at dir.
  * `DROP TABLE` on an external table removes the pointer only (the
  * data belongs to its location); on a managed table it removes the
  * directory.
  *
  * Reads: [[GraftTable]] deliberately declares NO DSv2 scan
  * capability. The analyzer rule [[GraftCatalogScanRule]] (injected
  * by GraftExtensions) replaces the relation with the production
  * DeltaReader plan — the same distributed scan, DV anti-join,
  * column mapping and stats pruning every other entry point gets —
  * so there is exactly ONE read implementation. A session without
  * the extensions refuses the scan loudly instead of reading a
  * second-class path.
  *
  * Scale: every catalog operation is metadata-only (directory
  * listing + log replay through DeltaReader.snapshot); nothing here
  * touches data files.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: Path = _

  private def spark: SparkSession = SparkSession.active
  private def fs = root.getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null && r.nonEmpty,
      s"GraftCatalog '$name' needs a root directory: set spark.sql.catalog.$name.root")
    root = new Path(r)
  }

  override def name(): String = catalogName

  /** CREATE TABLE may declare IDENTITY / GENERATED columns and column
    * DEFAULTs — the analyzer gates the syntax on these capabilities
    * and hands the specs to [[createTable]] as field metadata, which
    * [[translateColumnMetadata]] converts to the table format's keys.
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** CREATE TABLE ... (cols, CONSTRAINT nm CHECK (expr)): CHECK
    * constraints fold into the table configuration as the format's
    * `delta.constraints.<name>` keys (the creating commit declares the
    * writer floor; every write enforces them); PK/FK/UNIQUE refuse —
    * the format has no enforced shape for them and an unenforced
    * declaration would lie to readers.
    */
  override def createTable(ident: Identifier, info: TableInfo): Table = {
    import org.apache.spark.sql.connector.catalog.constraints.Check
    val props = new util.HashMap[String, String](info.properties())
    info.constraints().foreach {
      case c: Check =>
        require(c.predicateSql() != null && c.predicateSql().nonEmpty,
          s"GraftCatalog: CHECK constraint '${c.name()}' carries no SQL predicate")
        props.put(s"delta.constraints.${c.name()}", c.predicateSql())
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: only CHECK constraints are enforced by the format; " +
          s"got ${other.toDDL} — declare it as documentation elsewhere")
    }
    createTable(ident, info.columns(), info.partitions(), props)
  }

  /** Spark's CREATE-time column-spec metadata → the Delta protocol's:
    * `identity.*` → `delta.identity.*` ([[graft.sources.IdentityColumns]]),
    * `generationExpression` → `delta.generationExpression` (what the
    * writers' enforceObligations computes/verifies), `CURRENT_DEFAULT`
    * kept as-is (delta-spark's own key; `EXISTS_DEFAULT` dropped — a
    * created table has no pre-existing rows for it to back-fill).
    */
  private def translateColumnMetadata(schema: StructType): StructType = {
    import org.apache.spark.sql.types.MetadataBuilder
    StructType(graft.sources.IdentityColumns.translateCreate(schema).fields.map { f =>
      var m = f.metadata
      if (m.contains("generationExpression")) {
        val mb = new MetadataBuilder().withMetadata(m)
          .putString("delta.generationExpression", m.getString("generationExpression"))
        mb.remove("generationExpression")
        m = mb.build()
      }
      if (m.contains("EXISTS_DEFAULT")) {
        val mb = new MetadataBuilder().withMetadata(m)
        mb.remove("EXISTS_DEFAULT")
        m = mb.build()
      }
      if (m eq f.metadata) f else f.copy(metadata = m)
    })
  }

  private def nsPath(namespace: Array[String]): Path = {
    require(namespace.length == 1,
      s"GraftCatalog namespaces are single-level (graft.db.t), got " +
        s"'${namespace.mkString(".")}'")
    new Path(root, namespace.head)
  }

  private def tableDir(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), ident.name())

  /** The directory queries actually read/write: the catalog dir
    * itself for a managed table, the pointed-at dir for an external
    * one.
    */
  private def dataDir(ident: Identifier): Path =
    GraftCatalogPaths.resolveDataDir(fs, tableDir(ident))

  private def isTable(dir: Path): Boolean =
    fs.exists(new Path(dir, "_delta_log")) ||
      fs.exists(new Path(dir, GraftCatalogPaths.PointerFile))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(isTable)
      .map(d => Identifier.of(namespace, d.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    GraftTable(spark, ident, dataDir(ident).toString, versionAsOf = None)
  }

  /** `SELECT ... TIMESTAMP AS OF ts` — the analyzer hands micros since
    * epoch; meaningful on in-commit-timestamp tables (the log carries
    * wall-clock time), resolved through the same versionAtTimestamp as
    * the path API (which falls back to log-file mtime on unstamped
    * tables).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dataDir(ident).toString
    val v = graft.sources.DeltaReader.versionAtTimestamp(spark, dir,
      timestampMicros / 1000L)
    GraftTable(spark, ident, dir, versionAsOf = Some(v))
  }

  /** `SELECT ... VERSION AS OF v` — time travel through the same
    * snapshot machinery as the path API.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new UnsupportedOperationException(
        s"GraftCatalog time travel takes a numeric version, got '$version'")
    }
    GraftTable(spark, ident, dataDir(ident).toString, versionAsOf = Some(v))
  }

  /** The V2-Column create: Spark's DEFAULT Column→StructField
    * conversion keeps comments and DEFAULTs but silently DROPS
    * identity specs and generation expressions — a catalog declaring
    * those capabilities must read them off the [[Column]]s itself.
    * Re-encoded here under Spark's own metadata keys, which
    * [[translateColumnMetadata]] then converts to the protocol's.
    */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField}
    val schema = StructType(columns.map { c =>
      val mb = new MetadataBuilder().withMetadata(
        Option(c.metadataInJSON()).map(Metadata.fromJson).getOrElse(Metadata.empty))
      Option(c.comment()).foreach(mb.putString("comment", _))
      Option(c.defaultValue()).foreach { dv =>
        require(dv.getSql != null,
          s"GraftCatalog: column '${c.name()}' declares a DEFAULT without SQL text")
        mb.putString("CURRENT_DEFAULT", dv.getSql)
      }
      Option(c.generationExpression()).foreach(
        mb.putString("generationExpression", _))
      Option(c.identityColumnSpec()).foreach { s =>
        mb.putLong("identity.start", s.getStart)
        mb.putLong("identity.step", s.getStep)
        mb.putBoolean("identity.allowExplicitInsert", s.isAllowExplicitInsert)
      }
      StructField(c.name(), c.dataType(), c.nullable(), mb.build())
    })
    createTable(ident, schema, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val ns = nsPath(ident.namespace())
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(ident.namespace())
    // PARTITIONED BY (hive layout) and CLUSTER BY (the `clustering`
    // writer feature + delta.clustering domain) arrive as transforms;
    // Spark's grammar already forbids declaring both
    val clusterCols = partitions.collect {
      case c: org.apache.spark.sql.connector.expressions.ClusterByTransform =>
        c.columnNames.map { r =>
          require(r.fieldNames.length == 1,
            s"GraftCatalog: CLUSTER BY on nested field " +
              s"'${r.fieldNames.mkString(".")}' — top-level columns only")
          r.fieldNames.head
        }.toSeq
    }.flatten.toSeq
    val partCols = partitions.filterNot(
      _.isInstanceOf[org.apache.spark.sql.connector.expressions.ClusterByTransform])
      .map { t =>
        if (t.name == "identity" && t.references.length == 1 &&
            t.references.head.fieldNames.length == 1)
          t.references.head.fieldNames.head
        else throw new UnsupportedOperationException(
          s"GraftCatalog: only PARTITIONED BY (col, ...) identity partitioning and " +
            s"CLUSTER BY (col, ...) are supported, got transform '$t'")
      }.toSeq
    val props = properties.asScala.toMap
    props.get(TableCatalog.PROP_PROVIDER).foreach { p =>
      require(p.equalsIgnoreCase("delta") || p.equalsIgnoreCase("parquet"),
        s"GraftCatalog: USING '$p' — tables here ARE graft Delta tables " +
          "(omit USING or say delta)")
    }
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_TABLE_TYPE,
      TableCatalog.PROP_COLLATION, "option.path", "path")
    val configuration = props.filterNot { case (k, _) => reserved.contains(k) }
    val catDir = tableDir(ident)
    val (target, adoptExisting) = props.get(TableCatalog.PROP_LOCATION) match {
      case Some(loc) =>
        // external: pointer file under the catalog dir, data elsewhere.
        // A location already holding a Delta table is ADOPTED (the
        // delta-spark convention) — the declared schema must match
        // the log's, the log stays authoritative.
        fs.mkdirs(catDir)
        val out = fs.create(new Path(catDir, GraftCatalogPaths.PointerFile), false)
        try out.write(loc.getBytes("UTF-8")) finally out.close()
        (loc, fs.exists(new Path(new Path(loc), "_delta_log")))
      case None => (catDir.toString, false)
    }
    if (adoptExisting) {
      val snap = graft.sources.DeltaReader.snapshot(spark, target, None)
      val logSchema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
        .asInstanceOf[StructType]
      require(schema.isEmpty || schema.fieldNames.sameElements(logSchema.fieldNames),
        s"GraftCatalog: CREATE TABLE at existing Delta location $target declares " +
          s"columns (${schema.fieldNames.mkString(", ")}) but the log says " +
          s"(${logSchema.fieldNames.mkString(", ")}) — the log is authoritative; " +
          "declare matching columns or none")
    } else {
      val declared = translateColumnMetadata(schema)
      graft.sources.IdentityColumns.validate(declared, partCols,
        "GraftCatalog.createTable")
      if (clusterCols.nonEmpty) {
        graft.sources.Clustering.validate(declared, partCols, clusterCols,
          "GraftCatalog.createTable")
        // validated BEFORE the creating commit: a post-create refusal
        // would orphan the table behind a failed DDL statement
        require(configuration.getOrElse("delta.columnMapping.mode", "none") == "none",
          "GraftCatalog.createTable: CLUSTER BY on a column-mapped table is not " +
            "supported (the clustered OPTIMIZE rewrite would stage logical names " +
            "readers can't resolve)")
      }
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
      graft.sources.LakeWriter.writeDelta(empty, target, partitionBy = partCols,
        configuration = configuration)
      if (clusterCols.nonEmpty)
        graft.sources.LakeWriter.clusterBy(spark, target, clusterCols)
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = dataDir(ident).toString
    val w = graft.sources.LakeWriter
    // fold property changes into ONE metadata commit; column changes
    // commit one-by-one (each is its own schema evolution)
    val sets = changes.collect {
      case s: TableChange.SetProperty => s.property() -> s.value()
    }.toMap
    val unsets = changes.collect {
      case r: TableChange.RemoveProperty => r.property()
    }
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1 && a.position() == null,
          s"GraftCatalog ALTER ADD COLUMN: top-level columns without FIRST/AFTER, " +
            s"got ${a.fieldNames().mkString(".")}")
        w.alterAddColumns(spark, dir, Seq(a.fieldNames().head -> a.dataType().sql))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1,
          s"GraftCatalog ALTER RENAME COLUMN: top-level only, got " +
            s"${r.fieldNames().mkString(".")}")
        w.renameColumn(spark, dir, r.fieldNames().head, r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1,
          s"GraftCatalog ALTER DROP COLUMN: top-level only, got " +
            s"${d.fieldNames().mkString(".")}")
        w.dropColumn(spark, dir, d.fieldNames().head)
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames().length == 1,
          s"GraftCatalog ALTER COLUMN TYPE: top-level only, got " +
            s"${ut.fieldNames().mkString(".")}")
        w.widenColumnType(spark, dir, ut.fieldNames().head, ut.newDataType())
      case cb: TableChange.ClusterBy =>
        // ALTER TABLE t CLUSTER BY (cols) / CLUSTER BY NONE (empty) —
        // one domain-metadata commit, no rewrite (incremental OPTIMIZE
        // lays NEW data by the new columns; OPTIMIZE FULL re-keys
        // history — delta-spark's own re-key semantics)
        w.clusterBy(spark, dir, cb.clusteringColumns().toSeq.map { r =>
          require(r.fieldNames().length == 1,
            s"GraftCatalog ALTER CLUSTER BY: nested field " +
              s"'${r.fieldNames().mkString(".")}' — top-level columns only")
          r.fieldNames().head
        })
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog alterTable supports SET/UNSET TBLPROPERTIES, ADD/RENAME/DROP " +
          s"COLUMN; got $other")
    }
    if (sets.nonEmpty || unsets.nonEmpty) w.alterProperties(spark, dir, sets, unsets)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) false
    else {
      // external: drop the pointer, keep the data; managed: drop all
      fs.delete(tableDir(ident), true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val ns = nsPath(newIdent.namespace())
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(newIdent.namespace())
    require(fs.rename(tableDir(oldIdent), tableDir(newIdent)),
      s"GraftCatalog: rename ${tableDir(oldIdent)} -> ${tableDir(newIdent)} failed")
  }

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog namespaces carry no mutable metadata (a namespace IS a directory)")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val p = nsPath(namespace)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    fs.delete(p, true)
  }
}

/** The catalog's table handle: pure metadata (name, schema from the
  * log's schemaString, hive partitioning, table configuration).
  * Declares NO scan/write capability on purpose — reads substitute
  * the DeltaReader plan via [[GraftCatalogScanRule]], writes go
  * through the SQL DML rewrites onto LakeWriter. One engine, many
  * front doors.
  */
final case class GraftTable(spark: SparkSession, ident: Identifier, path: String,
                            versionAsOf: Option[Long]) extends Table {
  private lazy val snap = graft.sources.DeltaReader.snapshot(spark, path, versionAsOf)

  override def name(): String = ident.toString

  override def schema(): StructType = {
    // logical names: strip the column-mapping physical metadata the
    // log carries — a catalog user sees the names they query with
    val raw = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    StructType(raw.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
  }

  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.{ClusterByTransform, Expressions}
    val cluster = graft.sources.Clustering.columnsOf(snap)
    if (cluster.nonEmpty)
      // clustered tables are unpartitioned by protocol — surface the
      // CLUSTER BY declaration where DESCRIBE shows layout
      Array(ClusterByTransform(cluster.map(c => Expressions.column(c))))
    else snap.partCols.map(c => Expressions.identity(c)).toArray
  }

  override def properties(): util.Map[String, String] =
    (snap.configuration ++ Map(
      TableCatalog.PROP_PROVIDER -> "graft-delta",
      TableCatalog.PROP_LOCATION -> path,
      "version" -> snap.version.toString)).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
}

/** Name→directory resolution shared by the catalog, the SQL DML
  * rewrites and the streaming source: `graft.db.t` →
  * `<spark.sql.catalog.graft.root>/db/t`, following the external
  * `_graft_location` pointer when present.
  */
object GraftCatalogPaths {
  val PointerFile = "_graft_location"

  private[catalog] def resolveDataDir(fs: org.apache.hadoop.fs.FileSystem,
                                      catDir: Path): Path = {
    val ptr = new Path(catDir, PointerFile)
    if (!fs.exists(ptr)) catDir
    else {
      val in = fs.open(ptr)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new Path(bytes.toString("UTF-8").trim)
      } finally in.close()
    }
  }

  /** The table directory for `<catalog>.<db>.<table>`, or None when
    * no such catalog root is configured (the caller leaves the plan
    * to Spark).
    */
  def tablePath(spark: SparkSession, catalog: String, db: String,
                table: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$catalog")
      .filter(_ == classOf[GraftCatalog].getName)
      .flatMap(_ => spark.conf.getOption(s"spark.sql.catalog.$catalog.root"))
      .map { r =>
        val catDir = new Path(new Path(r, db), table)
        val fs = catDir.getFileSystem(spark.sessionState.newHadoopConf())
        resolveDataDir(fs, catDir).toString
      }
}
