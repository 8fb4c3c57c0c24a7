package graft.plans

import graft.sources.LakeWriter
import org.apache.spark.sql.{GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL DML for graft Delta tables — the write-side twin of the
  * `graft_delta(...)` read TVFs. Standard ANSI syntax against the
  * two-part name `graft_delta`.`/table/dir`:
  *
  *   DELETE FROM graft_delta.`/d` WHERE k = 'a'
  *   UPDATE graft_delta.`/d` SET v = v * 2 WHERE k = 'b'
  *   MERGE INTO graft_delta.`/d` AS t USING (SELECT ...) AS s
  *     ON t.id = s.id
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *   INSERT INTO graft_delta.`/d` SELECT ...            -- append
  *   INSERT OVERWRITE graft_delta.`/d` SELECT ...       -- atomic truncate-and-load
  *
  * Spark's own grammar already parses these statements into catalyst
  * DML plans (DeleteFromTable / UpdateTable / MergeIntoTable) — they
  * just cannot ANALYZE against a path-named table without a V2
  * catalog. So the injected parser (`spark.sql.extensions =
  * graft.GraftExtensions`) delegates parsing entirely to Spark and
  * only REWRITES the parsed plan when the target is the
  * `graft_delta`.`path` two-part name, into a RunnableCommand routed
  * to the production writers (LakeWriter.deleteWhere / updateWhere /
  * mergeInto) — same OCC commits, CDF rows, obligation gates and
  * refusals as the DataFrame API, because it IS the DataFrame API.
  * Every other statement passes through untouched.
  *
  * MERGE supports the full clause grammar over an equality-conjunction
  * ON clause (the key columns): `WHEN MATCHED [AND c] THEN UPDATE SET *
  * | SET col = expr, ... | DELETE`, `WHEN NOT MATCHED [AND c] THEN
  * INSERT * | (cols) VALUES (exprs)`, and `WHEN NOT MATCHED BY SOURCE
  * [AND c] THEN UPDATE ... | DELETE` — translated onto
  * [[LakeWriter.mergeIntoClauses]]'s `t`/`s` namespaces (clause
  * references must be alias-qualified; first-match-wins order is the
  * engine's own). WITH SCHEMA EVOLUTION evolves the table with the
  * source's new columns in the merge commit; non-equality ON terms
  * refuse loudly with the supported form — never a silently-different
  * merge.
  *
  * Table-service statements Spark's grammar lacks (OPTIMIZE [WHERE]
  * [ZORDER BY] / VACUUM RETAIN [DRY RUN] / RESTORE / SHALLOW CLONE /
  * CONVERT TO DELTA / GENERATE symlink_format_manifest) pre-parse
  * before delegation; CREATE [OR REPLACE] TABLE ... AS SELECT,
  * TRUNCATE TABLE, the ALTER TABLE family (columns, properties,
  * CHECK constraints) and the INSERT PARTITION forms (static window
  * replace, dynamic partition overwrite) rewrite from their parsed
  * catalyst plans onto the production writers.
  *
  * Alias hygiene: `DELETE FROM graft_delta.`/d` AS t WHERE t.k = 1`
  * strips the `t.` qualifier before handing the predicate to the
  * writer (the writer's `where` runs against the bare table columns).
  * Struct-field access keeps working — only the statement's declared
  * alias is stripped.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlDml.parseMaintenance(sqlText)
      .getOrElse(GraftSqlDml.rewrite(delegate.parsePlan(
        GraftSqlDml.preprocess(sqlText))))

  override def parsePlanWithParameters(sqlText: String,
                                       context: ParameterContext): LogicalPlan =
    GraftSqlDml.parseMaintenance(sqlText)
      .getOrElse(GraftSqlDml.rewrite(delegate.parsePlanWithParameters(
        GraftSqlDml.preprocess(sqlText), context)))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlDml {

  /** The two table-service statements Spark's grammar does not know —
    * parsed here BEFORE delegation (the DeltaSqlParser pattern):
    *
    *   OPTIMIZE graft_delta.`/d` [ZORDER BY (c1..c4)] [FULL]
    *   VACUUM graft_delta.`/d` [LITE] RETAIN <n> VERSIONS [DRY RUN]
    *
    * OPTIMIZE routes to the small-file compaction (Z-ORDER variant to
    * the Morton-clustered rewrite); VACUUM's retention is VERSION-based
    * (keep the newest n versions' files — graft logs carry
    * deterministic zero timestamps, so an hours-based RETAIN would be
    * meaningless here; the version form is also what the engine's
    * vacuumDelta takes). A statement that starts like one of these and
    * names graft_delta but doesn't match the supported form refuses
    * loudly with it; OPTIMIZE/VACUUM over other tables delegate (and
    * fail Spark's own parse — pass-through, not capture).
    */
  /** Catalog names in maintenance statements: `<cat>.<db>.<t>` where
    * `<cat>` registers a GraftCatalog normalizes to the path-literal
    * form `graft_delta.`<dir>`` BEFORE the maintenance regexes run,
    * so `OPTIMIZE graft.db.t ZORDER BY (a, b)` and friends work by
    * name. Names under unknown catalogs pass through unchanged (and
    * hit the existing loud refusals / Spark's own parse errors).
    */
  private def normalizeNamedTargets(t: String): String = {
    val named = """(?<![\w`.])(\w+)\s*\.\s*(\w+)\s*\.\s*(\w+)(?![\w`.])""".r
    named.replaceAllIn(t, m =>
      graft.catalog.GraftCatalogPaths.tablePath(SparkSession.active,
        m.group(1), m.group(2), m.group(3)) match {
        case Some(p) =>
          java.util.regex.Matcher.quoteReplacement(s"graft_delta.`$p`")
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      })
  }

  /** Statement sugar delegated as TEXT: `DESCRIBE HISTORY t` /
    * `DESCRIBE DETAIL t` rewrite onto their table-valued twins
    * (`graft_delta_history` / `graft_delta_detail`), so the familiar
    * delta-spark spelling and the TVF are the SAME plan — catalog
    * names normalize to the path form first. Everything else passes
    * through verbatim.
    */
  def preprocess(sqlText: String): String = {
    val t0 = sqlText.trim.stripSuffix(";").trim
    if (!t0.matches("(?is)^DESC(RIBE)?\\s+(HISTORY|DETAIL)\\b.*")) return sqlText
    val t = normalizeNamedTargets(t0)
    val descRe =
      """(?is)^DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+graft_delta\s*\.\s*`([^`]+)`$""".r
    t match {
      case descRe(kind, path) =>
        val fn = if (kind.equalsIgnoreCase("HISTORY")) "graft_delta_history"
          else "graft_delta_detail"
        s"SELECT * FROM $fn('${path.replace("'", "''")}')"
      case _ => sqlText
    }
  }

  def parseMaintenance(sqlText: String): Option[LogicalPlan] = {
    val t0 = sqlText.trim.stripSuffix(";").trim
    val t =
      if (t0.matches("(?is)^(OPTIMIZE|VACUUM|RESTORE|GENERATE|CONVERT|REORG)\\b.*") ||
          t0.matches("(?is)^CREATE\\s+TABLE\\s.*SHALLOW\\s+CLONE\\s.*") ||
          t0.matches("(?is)^ALTER\\s+TABLE\\s.*DROP\\s+FEATURE\\s.*"))
        normalizeNamedTargets(t0)
      else t0
    val optimizeRe =
      """(?is)^OPTIMIZE\s+graft_delta\s*\.\s*`([^`]+)`(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\)|\s+(FULL))?$""".r
    val vacuumRe =
      """(?is)^VACUUM\s+graft_delta\s*\.\s*`([^`]+)`(\s+LITE)?\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS)(\s+DRY\s+RUN)?$""".r
    val restoreRe =
      """(?is)^RESTORE\s+(?:TABLE\s+)?graft_delta\s*\.\s*`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)$""".r
    val restoreTsRe =
      """(?is)^RESTORE\s+(?:TABLE\s+)?graft_delta\s*\.\s*`([^`]+)`\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'$""".r
    val cloneRe =
      """(?is)^CREATE\s+TABLE\s+graft_delta\s*\.\s*`([^`]+)`\s+SHALLOW\s+CLONE\s+graft_delta\s*\.\s*`([^`]+)`\s*(?:VERSION\s+AS\s+OF\s+(\d+))?$""".r
    val convertRe =
      """(?is)^CONVERT\s+TO\s+DELTA\s+parquet\s*\.\s*`([^`]+)`\s*(?:PARTITIONED\s+BY\s*\(([^)]+)\))?$""".r
    val manifestRe =
      """(?is)^GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+graft_delta\s*\.\s*`([^`]+)`$""".r
    val reorgRe =
      """(?is)^REORG\s+TABLE\s+graft_delta\s*\.\s*`([^`]+)`(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)$""".r
    val dropFeatureRe =
      """(?is)^ALTER\s+TABLE\s+graft_delta\s*\.\s*`([^`]+)`\s+DROP\s+FEATURE\s+`?(\w+)`?(\s+TRUNCATE\s+HISTORY)?$""".r
    t match {
      case reorgRe(path, where) =>
        Some(GraftReorgCommand(path, Option(where).map(_.trim)))
      case dropFeatureRe(path, feature, trunc) =>
        Some(GraftDropFeatureCommand(path, feature, trunc != null))
      case optimizeRe(path, where, zcols, full) =>
        Some(GraftOptimizeCommand(path,
          if (zcols == null) Nil
          else zcols.split(',').toSeq.map(_.trim).filter(_.nonEmpty),
          Option(where).map(_.trim), full = full != null))
      case vacuumRe(path, liteKw, n, unit, dry) =>
        Some(GraftVacuumCommand(path, n.toLong,
          hours = unit.equalsIgnoreCase("HOURS"), dryRun = dry != null,
          lite = liteKw != null))
      case restoreRe(path, v) =>
        Some(GraftRestoreCommand(path, v.toLong))
      case restoreTsRe(path, ts) =>
        Some(GraftRestoreTimestampCommand(path, ts))
      case cloneRe(dst, src, v) =>
        Some(GraftCloneCommand(src, dst,
          if (v == null) None else Some(v.toLong)))
      case convertRe(path, parts) =>
        val partPairs = Option(parts).map(_.split(',').toSeq.map { p =>
          p.trim.split("\\s+") match {
            case Array(n, t) => n -> t
            case other => throw new UnsupportedOperationException(
              s"CONVERT TO DELTA: PARTITIONED BY entries are 'name type', got " +
                s"'${other.mkString(" ")}'")
          }
        }).getOrElse(Nil)
        Some(GraftConvertCommand(path, partPairs))
      case manifestRe(path) =>
        Some(GraftManifestCommand(path))
      case _ if t.matches("(?is)^(OPTIMIZE|VACUUM|RESTORE|REORG)\\s.*graft_delta.*") ||
          t.matches("(?is)^ALTER\\s+TABLE\\s.*graft_delta.*DROP\\s+FEATURE\\s.*") ||
          t.matches("(?is)^CREATE\\s+TABLE\\s.*SHALLOW\\s+CLONE\\s.*graft_delta.*") ||
          t.matches("(?is)^(CONVERT\\s+TO\\s+DELTA|GENERATE)\\s.*(graft_delta|parquet\\s*\\.).*") =>
        throw new UnsupportedOperationException(
          "graft_delta maintenance supports exactly: OPTIMIZE graft_delta.`path` " +
            "[WHERE partPred] [ZORDER BY (cols...)] [FULL]; VACUUM graft_delta.`path` " +
            "RETAIN <n> VERSIONS [DRY RUN] (version-based retention — graft logs " +
            "carry no wall clock); RESTORE [TABLE] graft_delta.`path` TO VERSION " +
            "AS OF <v>; CREATE TABLE graft_delta.`dst` SHALLOW CLONE " +
            "graft_delta.`src` [VERSION AS OF <v>]; CONVERT TO DELTA " +
            "parquet.`path` [PARTITIONED BY (name type, ...)]; GENERATE " +
            "symlink_format_manifest FOR TABLE graft_delta.`path`; REORG TABLE " +
            "graft_delta.`path` [WHERE partPred] APPLY (PURGE); ALTER TABLE " +
            "graft_delta.`path` DROP FEATURE <name> [TRUNCATE HISTORY]. " +
            s"Statement: $t")
      case _ => None
    }
  }

  /** The graft table target — either the path-literal two-part name
    * `graft_delta`.`<path>` or a catalog three-part name
    * `<cat>.<db>.<t>` where `<cat>` is a registered
    * [[graft.catalog.GraftCatalog]] — optionally under an alias.
    * Returns (resolved directory, alias).
    */
  private object GraftTarget {
    def unapply(plan: LogicalPlan): Option[(String, Option[String])] = plan match {
      case SubqueryAlias(ident, child) =>
        unapply(child).map { case (p, _) => (p, Some(ident.name)) }
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft_delta") =>
        Some((u.multipartIdentifier(1), None))
      case u: UnresolvedRelation if u.multipartIdentifier.length == 3 =>
        val Seq(cat, db, t) = u.multipartIdentifier
        graft.catalog.GraftCatalogPaths.tablePath(SparkSession.active, cat, db, t)
          .map(p => (p, None))
      case _ => None
    }
  }

  def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(GraftTarget(path, alias), cond) =>
      GraftDeleteCommand(path, predicateSql(cond, alias))
    case UpdateTable(GraftTarget(path, alias), assignments, cond) =>
      val sets = assignments.map { a =>
        columnName(a.key, alias) -> predicateSql(a.value, alias)
      }
      GraftUpdateCommand(path,
        cond.map(predicateSql(_, alias)).getOrElse("true"), sets)
    case m @ MergeIntoTable(GraftTarget(path, tAlias), source, onCond,
        matched, notMatched, bySource, withSchemaEvolution) =>
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"graft_delta MERGE supports: equality-conjunction ON; WHEN MATCHED [AND c] " +
          "THEN UPDATE SET * | SET col = expr, ... | DELETE; WHEN NOT MATCHED [AND c] " +
          "THEN INSERT * | (cols) VALUES (exprs); WHEN NOT MATCHED BY SOURCE [AND c] " +
          s"THEN UPDATE SET ... | DELETE; $why. Statement: ${m.simpleString(5)}")
      // WITH SCHEMA EVOLUTION passes through to the clause engine —
      // new source columns evolve the table schema in the merge commit
      // the source's declared alias (or bare relation name) — clause
      // expressions rewrite onto the engine's `t`/`s` struct namespaces
      val sAlias: Option[String] = source match {
        case SubqueryAlias(id, _) => Some(id.name)
        case u: UnresolvedRelation => Some(u.multipartIdentifier.last)
        case _ => None
      }
      def clauseSql(e: Expression): String = e.transform {
        case attr: UnresolvedAttribute if attr.nameParts.length > 1 &&
            tAlias.exists(attr.nameParts.head.equalsIgnoreCase) =>
          UnresolvedAttribute("t" +: attr.nameParts.tail)
        case attr: UnresolvedAttribute if attr.nameParts.length > 1 &&
            sAlias.exists(attr.nameParts.head.equalsIgnoreCase) =>
          UnresolvedAttribute("s" +: attr.nameParts.tail)
        case attr: UnresolvedAttribute if attr.nameParts.length == 1 ||
            !Seq("t", "s").contains(attr.nameParts.head.toLowerCase) =>
          refuse(s"clause reference '${attr.sql}' must be qualified with the " +
            "statement's target/source alias (both rows are in scope)")
      }.sql
      def sets(assigns: Seq[Assignment]): Map[String, String] =
        assigns.map(a => columnName(a.key, tAlias) -> clauseSql(a.value)).toMap
      val mClauses = matched.map {
        case UpdateStarAction(cond) =>
          graft.sources.MergeClause(cond.map(clauseSql), graft.sources.MergeUpdateAll)
        case UpdateAction(cond, assigns, _) =>
          graft.sources.MergeClause(cond.map(clauseSql),
            graft.sources.MergeUpdate(sets(assigns)))
        case DeleteAction(cond) =>
          graft.sources.MergeClause(cond.map(clauseSql), graft.sources.MergeDelete)
        case other => refuse(s"unsupported matched action $other")
      }
      val nmClauses = notMatched.map {
        case InsertStarAction(cond) =>
          graft.sources.MergeClause(cond.map(clauseSql), graft.sources.MergeInsertAll)
        case InsertAction(cond, assigns) =>
          graft.sources.MergeClause(cond.map(clauseSql),
            graft.sources.MergeInsert(sets(assigns)))
        case other => refuse(s"unsupported not-matched action $other")
      }
      val bsClauses = bySource.map {
        case UpdateAction(cond, assigns, _) =>
          graft.sources.MergeClause(cond.map(clauseSql),
            graft.sources.MergeUpdate(sets(assigns)))
        case DeleteAction(cond) =>
          graft.sources.MergeClause(cond.map(clauseSql), graft.sources.MergeDelete)
        case other => refuse(s"unsupported not-matched-by-source action $other")
      }
      val keys = conjuncts(onCond).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
          a.nameParts.last
        case other => refuse(s"ON clause term '${other.sql}' is not t.col = s.col")
      }
      GraftMergeCommand(path, source, keys, mClauses, nmClauses, bsClauses,
        schemaEvolution = withSchemaEvolution)
    case i @ InsertIntoStatement(GraftTarget(path, _), partitionSpec,
        userSpecifiedCols, query, overwrite, ifPartitionNotExists, byName) =>
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"graft_delta INSERT supports exactly: INSERT [OVERWRITE] [BY NAME] " +
          "with a full-width row set (optionally naming ALL table columns); " +
          s"$why. Statement: ${i.simpleString(5)}")
      val static = partitionSpec.collect { case (k, Some(v)) => k -> v }
      val dynamic = partitionSpec.collect { case (k, None) => k }.toSeq
      if (dynamic.nonEmpty && !overwrite)
        refuse("dynamic PARTITION columns only compose with OVERWRITE (for a plain " +
          "INSERT just include the column in the SELECT)")
      if (partitionSpec.nonEmpty && (userSpecifiedCols.nonEmpty || byName))
        refuse("PARTITION clauses compose with the positional form only")
      if (ifPartitionNotExists) refuse("IF NOT EXISTS is not supported")
      GraftInsertCommand(path, query, userSpecifiedCols, overwrite, byName,
        static, dynamic)
    case ctas: CreateTableAsSelect =>
      ctasPath(ctas.name) match {
        case Some(path) =>
          GraftCtasCommand(path, ctas.query,
            ctasPartCols(ctas.partitioning, "CREATE TABLE ... AS SELECT"),
            ctasProperties(ctas.tableSpec, "CREATE TABLE ... AS SELECT"),
            replace = false, ifNotExists = ctas.ignoreIfExists)
        case None => ctas
      }
    case rtas: ReplaceTableAsSelect =>
      ctasPath(rtas.name) match {
        case Some(path) =>
          GraftCtasCommand(path, rtas.query,
            ctasPartCols(rtas.partitioning, "REPLACE TABLE ... AS SELECT"),
            ctasProperties(rtas.tableSpec, "REPLACE TABLE ... AS SELECT"),
            replace = true, ifNotExists = false, orCreate = rtas.orCreate)
        case None => rtas
      }
    // the ALTER TABLE family — routed to the metadata-commit writers
    case AddColumns(GraftAlterTarget(path), cols) =>
      // nested names (s.score) route through the same dotted-path add
      // the Scala API takes (r16); FIRST/AFTER and DEFAULT still refuse
      val simple = cols.map { c =>
        if (c.position.nonEmpty || c.default.nonEmpty)
          throw new UnsupportedOperationException(
            "graft_delta ALTER TABLE ADD COLUMNS supports columns without " +
              "FIRST/AFTER position or DEFAULT (a default that rewrites history does " +
              "not exist in the protocol — ADD the column, then ALTER COLUMN ... SET " +
              s"DEFAULT for future writes), got $c")
        if (!c.nullable)
          throw new UnsupportedOperationException(
            "graft_delta ALTER TABLE ADD COLUMNS refuses NOT NULL — existing " +
              "rows read the new column as null and cannot satisfy it " +
              s"(delta-spark refuses this too), got $c")
        c.name.mkString(".") -> c.dataType.sql
      }
      val comments = cols.flatMap(c =>
        c.comment.map(txt => c.name.mkString(".") -> txt)).toMap
      GraftAlterAddColumnsCommand(path, simple, comments)
    case RenameColumn(GraftAlterTarget(path), col, newName) =>
      GraftAlterRenameColumnCommand(path, col.name.mkString("."), newName)
    case DropColumns(GraftAlterTarget(path), cols, _) =>
      GraftAlterDropColumnsCommand(path, cols.map(_.name.mkString(".")))
    case ac @ AlterColumns(GraftAlterTarget(path), specs)
        if specs.forall(sp => sp.newDataType.nonEmpty) =>
      // ALTER COLUMN c TYPE <wider> — the typeWidening feature
      specs.foreach { sp =>
        require(sp.newNullability.isEmpty &&
            sp.newComment.isEmpty && sp.newPosition.isEmpty &&
            sp.newDefaultExpression.isEmpty,
          s"graft_delta ALTER COLUMN ... TYPE changes the type only, got " +
            s"${ac.simpleString(5)}")
      }
      GraftAlterColumnTypeCommand(path, specs.map { sp =>
        sp.column.name.mkString(".") -> sp.newDataType.get
      })
    case ac @ AlterColumns(GraftAlterTarget(path), specs)
        if specs.forall(sp => sp.newComment.nonEmpty) =>
      // ALTER COLUMN c COMMENT 'text' — nested leaves included
      specs.foreach(sp => require(sp.newDataType.isEmpty &&
          sp.newNullability.isEmpty && sp.newPosition.isEmpty &&
          sp.newDefaultExpression.isEmpty,
        s"graft_delta ALTER COLUMN ... COMMENT changes the comment only, got " +
          s"${ac.simpleString(5)}"))
      GraftAlterColumnCommentCommand(path, specs.map { sp =>
        sp.column.name.mkString(".") -> sp.newComment.get
      })
    case ac @ AlterColumns(GraftAlterTarget(path), specs) =>
      specs.foreach { sp =>
        require(sp.column.name.length == 1 && sp.newDataType.isEmpty &&
            sp.newNullability.isEmpty && sp.newComment.isEmpty && sp.newPosition.isEmpty,
          s"graft_delta ALTER COLUMN supports TYPE <wider>, COMMENT, or SET DEFAULT " +
            s"/ DROP DEFAULT (defaults on top-level columns only), got ${ac.simpleString(5)}")
      }
      GraftAlterColumnDefaultCommand(path, specs.map { sp =>
        sp.column.name.head -> sp.newDefaultExpression.map(_.originalSQL)
      })
    case SetTableProperties(GraftAlterTarget(path), props) =>
      GraftAlterPropertiesCommand(path, props, Nil)
    case UnsetTableProperties(GraftAlterTarget(path), keys, _) =>
      GraftAlterPropertiesCommand(path, Map.empty, keys)
    // ADD CONSTRAINT ... CHECK parses to AddCheckConstraint whose
    // child is a violation-filter over the relation — we extract path
    // and condition and do our own validation scan (the filter's
    // relation can't resolve without a catalog anyway)
    case acc: AddCheckConstraint =>
      val target = acc.child.collectFirst {
        case r @ (_: UnresolvedRelation | _: SubqueryAlias) => r
      }
      target.flatMap(GraftTarget.unapply(_).map(_._1)) match {
        case Some(path) =>
          GraftAddConstraintCommand(path,
            acc.checkConstraint.userProvidedName, acc.checkConstraint.condition)
        case None => acc
      }
    case AddConstraint(GraftAlterTarget(path), c) =>
      throw new UnsupportedOperationException(
        "graft_delta ALTER TABLE ADD CONSTRAINT supports CHECK constraints " +
          s"(enforced on every subsequent write), got $c for $path")
    case DropConstraint(GraftAlterTarget(path), name, _, _) =>
      GraftAlterPropertiesCommand(path, Map.empty, Seq(s"delta.constraints.$name"))
    case TruncateTable(GraftAlterTarget(path)) =>
      GraftTruncateCommand(path)
    case other => other
  }

  /** ALTER TABLE statements wrap their target as `UnresolvedTable`;
    * catalog three-part names resolve like [[GraftTarget]].
    */
  private object GraftAlterTarget {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft_delta") =>
        Some(u.multipartIdentifier(1))
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable
          if u.multipartIdentifier.length == 3 =>
        val Seq(cat, db, t) = u.multipartIdentifier
        graft.catalog.GraftCatalogPaths.tablePath(SparkSession.active, cat, db, t)
      case _ => None
    }
  }

  private def ctasPath(name: LogicalPlan): Option[String] = name match {
    case UnresolvedIdentifier(Seq(cat, path), _)
        if cat.equalsIgnoreCase("graft_delta") => Some(path)
    case UnresolvedIdentifier(Seq(cat, db, t), _) =>
      // CTAS may target a not-yet-existing catalog table: the name
      // resolves to <root>/db/t regardless of existence
      graft.catalog.GraftCatalogPaths.tablePath(SparkSession.active, cat, db, t)
    case _ => None
  }

  private def ctasPartCols(partitioning: Seq[Transform], stmt: String): Seq[String] =
    partitioning.map { t =>
      // the Scala case classes (IdentityTransform) are private[sql];
      // the public connector interface identifies the shape by name
      if (t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1)
        t.references.head.fieldNames.head
      else throw new UnsupportedOperationException(
        s"graft_delta $stmt: only PARTITIONED BY (col, ...) identity partitioning " +
          s"is supported (the table format's hive layout), got transform '$t'")
    }

  private def ctasProperties(spec: TableSpecBase, stmt: String): Map[String, String] =
    spec match {
      case u: UnresolvedTableSpec =>
        u.provider.foreach { p =>
          require(p.equalsIgnoreCase("delta") || p.equalsIgnoreCase("parquet"),
            s"graft_delta $stmt: USING '$p' — the target IS a graft Delta table " +
              "(omit USING or say delta)")
        }
        require(u.location.isEmpty,
          s"graft_delta $stmt: LOCATION is the graft_delta.`path` name itself — " +
            "a second location is ambiguous")
        u.properties
      case other => throw new UnsupportedOperationException(
        s"graft_delta $stmt: unsupported table spec $other")
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** SQL text of an unresolved expression with the statement's table
    * alias stripped from attribute qualifiers, so the writer can apply
    * it over the bare table columns.
    */
  private def predicateSql(e: Expression, alias: Option[String]): String = {
    val stripped = alias.fold(e) { a =>
      e.transform {
        case attr: UnresolvedAttribute
            if attr.nameParts.length > 1 && attr.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(attr.nameParts.tail)
      }
    }
    stripped.sql
  }

  private def columnName(e: Expression, alias: Option[String]): String = e match {
    case attr: UnresolvedAttribute =>
      val parts = alias match {
        case Some(a) if attr.nameParts.length > 1 &&
          attr.nameParts.head.equalsIgnoreCase(a) => attr.nameParts.tail
        case _ => attr.nameParts
      }
      require(parts.length == 1,
        s"graft_delta UPDATE: SET targets must be top-level columns, got ${attr.sql}")
      parts.head
    case other => throw new UnsupportedOperationException(
      s"graft_delta UPDATE: SET target '${other.sql}' is not a column")
  }
}

/** Tables declaring `delta.enableDeletionVectors=true` mutate
  * MERGE-ON-READ by default (delta-spark's own selector) — DV marks
  * instead of file rewrites; everything else stays copy-on-write.
  * Row-tracked tables compose on the DV path too: surviving rows keep
  * their ids (the DV'd files carry baseRowId verbatim), changed rows
  * take fresh ids from the watermark in the same commit.
  */
private object GraftDmlMode {
  def mergeOnRead(spark: SparkSession, path: String): Boolean = {
    val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
    snap.configuration.get("delta.enableDeletionVectors").contains("true")
  }
}

/** `DELETE FROM graft_delta.`path` WHERE ...` */
case class GraftDeleteCommand(path: String, predicate: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (GraftDmlMode.mergeOnRead(spark, path))
      LakeWriter.deleteWhereDv(spark, path, predicate)
    else LakeWriter.deleteWhere(spark, path, predicate)
    Seq.empty
  }
}

/** `UPDATE graft_delta.`path` SET ... [WHERE ...]` */
case class GraftUpdateCommand(path: String, predicate: String,
                              sets: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (GraftDmlMode.mergeOnRead(spark, path))
      LakeWriter.updateWhereDv(spark, path, predicate, sets.toMap)
    else LakeWriter.updateWhere(spark, path, predicate, sets.toMap)
    Seq.empty
  }
}

/** `INSERT [OVERWRITE] INTO graft_delta.`path` [(cols)] [BY NAME]
  * SELECT ...` — append routes to [[LakeWriter.appendDelta]], OVERWRITE
  * to the atomic truncate-and-load [[LakeWriter.overwriteDelta]]; both
  * get the writers' obligation enforcement, OCC commits and CDF
  * staging. Column alignment follows Spark SQL's own INSERT rules:
  * positional by default (source names ignored — renamed to the table's
  * columns in order), by name under `BY NAME` or an explicit column
  * list; a column list must name EVERY table column (partial-width
  * inserts would silently null-fill — refused loudly instead).
  */
case class GraftInsertCommand(path: String, source: LogicalPlan,
                              userCols: Seq[String], overwrite: Boolean,
                              byName: Boolean,
                              partitionSpec: Map[String, String] = Map.empty,
                              dynamicCols: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
    val tableSchema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    val tableCols = tableSchema.fieldNames.toSeq
    val src = GraftColumnBridge.ofRows(spark, source)
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"graft_delta INSERT into $path: $why (table columns: " +
        s"${tableCols.mkString(", ")}; source columns: " +
        s"${src.columns.mkString(", ")})")
    // store assignment: a source column whose type safely WIDENS to
    // the declared type upcasts (INT literal into a BIGINT column —
    // the everyday `INSERT ... VALUES (1, ...)`); a lossy or senseless
    // mismatch still refuses via the writer's schema gate
    def upcast(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val declared = tableSchema.fields.map(f => f.name -> f.dataType).toMap
      df.select(df.schema.fields.map { f =>
        val want = declared(f.name)
        if (f.dataType == want) df.col(f.name)
        else if (org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f.dataType, want) ||
            org.apache.spark.sql.catalyst.expressions.Cast.canANSIStoreAssign(f.dataType, want))
          df.col(f.name).cast(want).as(f.name)
        else df.col(f.name)
      }.toIndexedSeq: _*)
    }
    if (partitionSpec.nonEmpty || dynamicCols.nonEmpty) {
      // the PARTITION forms: static columns (dt = 'x') inject as
      // literals; dynamic columns (Hive order: LAST in the SELECT)
      // come from the source. OVERWRITE replaces exactly the written
      // window — the static conjunction plus, for dynamic columns,
      // the batch's own distinct partition tuples — atomically via
      // overwriteWhere; plain INSERT appends into it.
      val badKeys = (partitionSpec.keys ++ dynamicCols).filterNot(k =>
        snap.partCols.exists(_.equalsIgnoreCase(k)))
      if (badKeys.nonEmpty)
        refuse(s"PARTITION names ${badKeys.mkString(", ")}, but the table " +
          s"partitions by (${snap.partCols.mkString(", ")})")
      val dynNames = dynamicCols.map(k => tableCols.find(_.equalsIgnoreCase(k)).get)
      val rest = tableCols.filterNot(c =>
        partitionSpec.keys.exists(_.equalsIgnoreCase(c)) ||
          dynNames.exists(_.equalsIgnoreCase(c)))
      if (src.columns.length != rest.length + dynNames.length)
        refuse(s"with this PARTITION clause the source must produce the " +
          s"${rest.length} non-partition columns then the ${dynNames.length} " +
          s"dynamic partition column(s), got ${src.columns.length}")
      val typeOf = tableSchema.fields.map(f => f.name -> f.dataType).toMap
      val renamed = src.toDF((rest ++ dynNames): _*)
      val withParts = partitionSpec.foldLeft(renamed) { case (d, (k, v)) =>
        val name = tableCols.find(_.equalsIgnoreCase(k)).get
        d.withColumn(name, lit(v).cast(typeOf(name)))
      }
      val aligned1 = withParts.select(tableCols.map(withParts.col): _*)
      val aligned = upcast(dynNames.foldLeft(aligned1) { (d, n) =>
        d.withColumn(n, d.col(n).cast(typeOf(n)))
      })
      if (overwrite) {
        def sqlLit(name: String, v: String): String =
          if (v == null) s"$name IS NULL"
          else s"$name = CAST('${v.replace("'", "''")}' AS ${typeOf(name).sql})"
        val staticPred = partitionSpec.map { case (k, v) =>
          sqlLit(tableCols.find(_.equalsIgnoreCase(k)).get, v)
        }.toSeq
        val dynPred =
          if (dynNames.isEmpty) Nil
          else {
            // the replaced window = the batch's own partition tuples;
            // bounded so the predicate (and the find phase) stays sane
            val tuples = aligned.select(dynNames.map(aligned.col): _*)
              .distinct().limit(10001).collect()
            if (tuples.isEmpty) return Seq.empty // empty batch: no-op
            if (tuples.length > 10000)
              refuse("dynamic OVERWRITE would replace >10000 partitions in one " +
                "statement — split the load or use INSERT OVERWRITE without PARTITION")
            Seq(tuples.map { r =>
              dynNames.zipWithIndex.map { case (n, i) =>
                // typed literals, not string round-trips: a timestamp
                // or scientific-notation double rendered via toString
                // + CAST could mismatch the staged rows and replace
                // the wrong window; Literal.sql renders exactly (a
                // Column's lazy node renders as an unresolved
                // `columnnodeexpression` call — build the Literal
                // directly)
                Option(r.get(i)) match {
                  case None => s"$n IS NULL"
                  case Some(v) =>
                    s"$n = ${org.apache.spark.sql.catalyst.expressions.Literal(v).sql}"
                }
              }.mkString("(", " AND ", ")")
            }.mkString("(", " OR ", ")"))
          }
        LakeWriter.overwriteWhere(aligned, path, (staticPred ++ dynPred).mkString(" AND "))
      } else LakeWriter.appendDelta(aligned, path)
      return Seq.empty
    }
    val aligned = upcast(
      if (userCols.nonEmpty) {
        // INSERT INTO t (a, b, c): the list names ALL table columns in
        // the SOURCE's positional order; realign to table order by name
        if (userCols.length != src.columns.length)
          refuse(s"column list names ${userCols.length} columns but the source " +
            s"produces ${src.columns.length}")
        val defaulted = tableSchema.fields
          .filter(_.metadata.contains("CURRENT_DEFAULT")).map(_.name).toSet
        // identity columns are omissible too: they stay OUT of the
        // batch and appendDelta/overwrite GENERATES them
        val identityCols = tableSchema.fields
          .filter(_.metadata.contains(
            graft.sources.IdentityColumns.StartKey)).map(_.name).toSet
        val missing = tableCols.filterNot(t => userCols.exists(_.equalsIgnoreCase(t)))
        val missingNoDefault = missing.filterNot(defaulted ++ identityCols)
        if (missingNoDefault.nonEmpty)
          refuse(s"column list omits ${missingNoDefault.mkString(", ")} — only " +
            "columns with a declared DEFAULT or GENERATED identity may be omitted " +
            "(partial-width inserts would silently null-fill)")
        val renamed = src.toDF(userCols: _*)
        // omitted DEFAULTed columns take their declared constant;
        // omitted identity columns stay absent (generated downstream)
        val filled = missing.filterNot(identityCols).foldLeft(renamed) { (d, c) =>
          val f = tableSchema.fields.find(_.name == c).get
          d.withColumn(c, org.apache.spark.sql.functions
            .expr(f.metadata.getString("CURRENT_DEFAULT")).cast(f.dataType))
        }
        filled.select(tableCols.filter(filled.columns.contains).map(filled.col): _*)
      } else if (byName) {
        val identityCols = tableSchema.fields
          .filter(_.metadata.contains(
            graft.sources.IdentityColumns.StartKey)).map(_.name).toSet
        val missing = tableCols.filterNot(t =>
          src.columns.exists(_.equalsIgnoreCase(t)) || identityCols(t))
        if (missing.nonEmpty)
          refuse(s"BY NAME source lacks ${missing.mkString(", ")}")
        src.select(tableCols.filter(t =>
          src.columns.exists(_.equalsIgnoreCase(t))).map(src.col): _*)
      } else {
        // positional: Spark SQL semantics — source names are ignored
        if (src.columns.length != tableCols.length)
          refuse(s"source produces ${src.columns.length} columns, table has " +
            s"${tableCols.length}")
        src.toDF(tableCols: _*)
      })
    if (overwrite) LakeWriter.overwriteDelta(aligned, path)
    else LakeWriter.appendDelta(aligned, path)
    Seq.empty
  }
}

/** `MERGE INTO graft_delta.`path` USING ... ON keys ...` with the full
  * clause grammar — the source sub-plan resolves lazily at run time
  * (it may itself read graft TVFs), then routes to the writer's
  * general clause engine [[LakeWriter.mergeIntoClauses]] (of which the
  * classic two-star upsert is the special case).
  */
case class GraftMergeCommand(path: String, source: LogicalPlan, keys: Seq[String],
                             matched: Seq[graft.sources.MergeClause],
                             notMatched: Seq[graft.sources.MergeClause],
                             bySource: Seq[graft.sources.MergeClause],
                             schemaEvolution: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.mergeIntoClauses(spark, path, GraftColumnBridge.ofRows(spark, source),
      keys, matched, notMatched, bySource, schemaEvolution = schemaEvolution)
    Seq.empty
  }
}

/** `OPTIMIZE graft_delta.`path` [WHERE partPred] [ZORDER BY (1..4 cols) | FULL]`
  * — small-file compaction / Morton-clustered rewrite through the
  * production maintenance ops (dataChange=false commits, row-tracking
  * preserved profile, DV folding — everything the DataFrame API does).
  * WHERE scopes the rewrite to matching PARTITIONS (predicates over
  * non-partition columns refuse) — the form a 100-TB table's nightly
  * maintenance actually runs.
  */
case class GraftOptimizeCommand(path: String, zorder: Seq[String],
                                where: Option[String] = None,
                                full: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
    val cluster = graft.sources.Clustering.columnsOf(snap)
    if (zorder.nonEmpty) {
      // a clustered table's layout is its CLUSTER BY declaration —
      // a one-off ZORDER would silently fight it (delta-spark's rule)
      require(cluster.isEmpty,
        s"OPTIMIZE ... ZORDER BY on a clustered table (CLUSTER BY " +
          s"${cluster.mkString(", ")}) — plain OPTIMIZE clusters by the " +
          "declared columns; ALTER TABLE ... CLUSTER BY to change them")
      // 1..4 columns, the generalized curve; ZORDER is always a FULL
      // re-layout of the scoped live set (it declares nothing)
      LakeWriter.compactDeltaCluster(spark, path, zorder, where = where,
        op = "compactDeltaZOrder")
    } else if (cluster.nonEmpty) {
      // clustered-table OPTIMIZE: INCREMENTAL re-layout along the
      // declared columns (only unclustered files rewrite); FULL
      // re-layouts every live file into one cube
      LakeWriter.compactDeltaCluster(spark, path, cluster, where = where,
        full = full)
    } else {
      require(!full,
        "OPTIMIZE ... FULL applies to clustered tables (it forces a full " +
          "re-layout along the CLUSTER BY columns); this table declares none")
      LakeWriter.compactDelta(spark, path, where = where)
    }
    Seq.empty
  }
}

/** `REORG TABLE graft_delta.`path` [WHERE partPred] APPLY (PURGE)` —
  * materialize deletion-vector debt by rewriting exactly the DV-
  * carrying files (cost ∝ DV debt); the prerequisite for DROP FEATURE
  * deletionVectors.
  */
case class GraftReorgCommand(path: String, where: Option[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.reorgPurge(spark, path, where)
    Seq.empty
  }
}

/** `ALTER TABLE graft_delta.`path` DROP FEATURE f [TRUNCATE HISTORY]`
  * — protocol downgrade once the feature leaves no trace
  * ([[LakeWriter.dropFeature]]'s per-feature checks).
  */
case class GraftDropFeatureCommand(path: String, feature: String,
                                   truncateHistory: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.dropFeature(spark, path, feature, truncateHistory)
    Seq.empty
  }
}

/** `VACUUM graft_delta.`path` RETAIN <n> VERSIONS [DRY RUN]` —
  * physical retention cleanup keeping the files any of the newest n
  * versions references (horizon = latest - n + 1, clamped at 0).
  * Version-based because graft's deterministic logs carry no wall
  * clock. DRY RUN computes and RETURNS the reclaimable paths (one
  * `path` row each) with zero side effects — the look-before-you-leap
  * an operator wants before an irreversible delete.
  */
case class GraftVacuumCommand(path: String, retain: Long,
                              hours: Boolean = false, dryRun: Boolean = false,
                              lite: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    if (!dryRun) Nil
    else Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "path", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
    val latest = snap.version
    val horizon =
      if (!hours) {
        require(retain >= 1,
          s"VACUUM graft_delta: RETAIN $retain VERSIONS must keep at least the " +
            "latest version")
        math.max(latest - retain + 1, 0L)
      } else {
        // the HOURS form needs wall-clock commits: only a table that
        // declares in-commit timestamps carries them — everywhere else
        // graft logs are deterministically zero and an hours horizon
        // would be meaningless
        require(LakeWriter.ictEnabled(snap.configuration),
          "VACUUM graft_delta: RETAIN n HOURS needs wall-clock commit times — " +
            "this table does not declare delta.enableInCommitTimestamps=true; " +
            "use the RETAIN n VERSIONS form (graft logs are deterministic by default)")
        val cutoff = System.currentTimeMillis() - retain * 3600L * 1000L
        // keep every version stamped at or after the cutoff; the
        // horizon is the OLDEST such version (or the latest when all
        // are older — VACUUM always keeps the current state)
        math.max(0L, LakeWriter.ictHorizonVersion(spark, path, latest, cutoff))
      }
    val deleted = LakeWriter.vacuumDelta(spark, path, horizon, dryRun = dryRun,
      lite = lite)
    if (dryRun) deleted.sorted.map(Row(_)) else Seq.empty
  }
}

/** `ALTER TABLE ... ALTER COLUMN c TYPE <wider>` — routes to
  * [[LakeWriter.widenColumnType]] (the typeWidening reader+writer
  * feature; one metadata commit, zero rewritten bytes).
  */
case class GraftAlterColumnTypeCommand(path: String,
                                       types: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    types.foreach { case (c, t) => LakeWriter.widenColumnType(spark, path, c, t) }
    Seq.empty
  }
}

/** `ALTER TABLE ... ALTER COLUMN c SET DEFAULT expr | DROP DEFAULT`
  * — routes to [[LakeWriter.alterColumnDefault]] (the
  * allowColumnDefaults writer feature).
  */
case class GraftAlterColumnDefaultCommand(path: String,
                                          defaults: Seq[(String, Option[String])])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    defaults.foreach { case (c, d) => LakeWriter.alterColumnDefault(spark, path, c, d) }
    Seq.empty
  }
}

/** `RESTORE graft_delta.`path` TO TIMESTAMP AS OF 'ts'` — only
  * meaningful on in-commit-timestamp tables, where the log itself
  * carries wall-clock time.
  */
case class GraftRestoreTimestampCommand(path: String, ts: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
    require(LakeWriter.ictEnabled(snap.configuration),
      "RESTORE ... TO TIMESTAMP AS OF needs wall-clock commit times — this table " +
        "does not declare delta.enableInCommitTimestamps=true; use TO VERSION AS OF " +
        "(graft logs are deterministic by default)")
    val millis = java.sql.Timestamp.valueOf(ts.replace("T", " ")).getTime
    LakeWriter.restoreDeltaTimestamp(spark, path, millis)
    Seq.empty
  }
}

/** The ALTER TABLE family — each a metadata-only commit through the
  * production writers, with all their gates (CM physical-name
  * assignment on rename, nullability/feature refusals, protocol
  * restatement).
  */
case class GraftAlterAddColumnsCommand(path: String, cols: Seq[(String, String)],
    comments: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.alterAddColumns(spark, path, cols, comments); Seq.empty
  }
}

case class GraftAlterColumnCommentCommand(path: String,
    comments: Seq[(String, String)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    comments.foreach { case (c, txt) =>
      graft.sources.LakeWriter.alterColumnComment(spark, path, c, Some(txt))
    }
    Seq.empty
  }
}

case class GraftAlterRenameColumnCommand(path: String, from: String, to: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.renameColumn(spark, path, from, to); Seq.empty
  }
}

case class GraftAlterDropColumnsCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    cols.foreach(LakeWriter.dropColumn(spark, path, _)); Seq.empty
  }
}

case class GraftAlterPropertiesCommand(path: String, set: Map[String, String],
                                       unset: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.alterProperties(spark, path, set, unset); Seq.empty
  }
}

/** `ALTER TABLE graft_delta.`path` ADD CONSTRAINT name CHECK (cond)` —
  * existing rows are VALIDATED first (one distributed scan; any
  * violation refuses with the count — a table must never declare a
  * constraint its rows break), then the `delta.constraints.name`
  * property commits with the writer-version floor bumped so legacy
  * writers can't append unchecked rows. Every subsequent write
  * enforces it through the writers' obligation pass.
  */
case class GraftAddConstraintCommand(path: String, name: String, condition: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val violations = graft.sources.DeltaReader.read(spark, path)
      .where(not(coalesce(expr(condition).cast("boolean"), lit(true)))).count()
    require(violations == 0,
      s"ADD CONSTRAINT $name: $violations existing row(s) violate ($condition); " +
        "fix the data first — a constraint the table already breaks would lie to " +
        "every reader")
    LakeWriter.alterProperties(spark, path,
      Map(s"delta.constraints.$name" -> condition))
    Seq.empty
  }
}

/** `RESTORE [TABLE] graft_delta.`path` TO VERSION AS OF <v>` — the
  * forward rewind commit (metadata-only, pre-restore history stays
  * time-travelable), via [[LakeWriter.restoreDelta]] with all its
  * refusals (metadata changes, vacuumed files, appendOnly, CDF).
  */
case class GraftRestoreCommand(path: String, version: Long)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.restoreDelta(spark, path, version)
    Seq.empty
  }
}

/** `CREATE TABLE graft_delta.`dst` SHALLOW CLONE graft_delta.`src`
  * [VERSION AS OF <v>]` — a zero-copy metadata clone referencing the
  * source's data files, via [[LakeWriter.cloneDelta]].
  */
case class GraftCloneCommand(srcPath: String, dstPath: String,
                             version: Option[Long])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.cloneDelta(spark, srcPath, dstPath, version)
    Seq.empty
  }
}

/** `TRUNCATE TABLE graft_delta.`path`` — one atomic empty overwrite:
  * every live file tombstones, history stays time-travelable, CDF
  * tables stage the complete delete set ([[LakeWriter.overwriteDelta]]
  * with an empty batch in the table's own schema).
  */
case class GraftTruncateCommand(path: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    LakeWriter.overwriteDelta(empty, path)
    Seq.empty
  }
}

/** `CONVERT TO DELTA parquet.`path` [PARTITIONED BY (name type, ...)]`
  * — in-place migration of a plain parquet directory into a Delta
  * table (no data rewrite), via [[LakeWriter.convertToDelta]].
  */
case class GraftConvertCommand(path: String, partitionCols: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.convertToDelta(spark, path, partitionCols)
    Seq.empty
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE graft_delta.`path`` —
  * Presto/Trino symlink manifests for the current snapshot, via
  * [[LakeWriter.generateManifest]]; returns one row per manifest file.
  */
case class GraftManifestCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "manifest", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    LakeWriter.generateManifest(spark, path).sorted.map(Row(_))
}

/** `CREATE [OR REPLACE] TABLE graft_delta.`path` [PARTITIONED BY ...]
  * [TBLPROPERTIES ...] AS SELECT ...` — create routes to writeDelta
  * (version-0 commit with the declared layout and configuration);
  * REPLACE of an existing table routes to the atomic truncate-and-load
  * [[LakeWriter.overwriteDelta]], which keeps history and the table's
  * existing metadata — so a schema- or layout-changing REPLACE refuses
  * loudly instead of silently re-authoring what readers rely on.
  */
case class GraftCtasCommand(path: String, query: LogicalPlan,
                            partCols: Seq[String],
                            properties: Map[String, String],
                            replace: Boolean, ifNotExists: Boolean,
                            orCreate: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val exists = fs.exists(new org.apache.hadoop.fs.Path(root, "_delta_log"))
    if (exists && !replace) {
      if (ifNotExists) return Seq.empty
      throw new IllegalStateException(
        s"graft_delta CTAS: table $path already exists — use IF NOT EXISTS to " +
          "no-op or CREATE OR REPLACE to atomically swap contents")
    }
    if (!exists && replace && !orCreate)
      throw new IllegalStateException(
        s"graft_delta REPLACE TABLE: no table at $path — use CREATE OR REPLACE")
    val df = GraftColumnBridge.ofRows(spark, query)
    if (exists) {
      val snap = graft.sources.DeltaReader.snapshot(spark, path, None)
      require(partCols.isEmpty || partCols == snap.partCols,
        s"graft_delta REPLACE TABLE: declared partitioning (${partCols.mkString(", ")}) " +
          s"differs from the table's (${snap.partCols.mkString(", ")}) — a REPLACE " +
          "keeps the table's metadata; drop the clause or recreate the table")
      require(properties.isEmpty,
        "graft_delta REPLACE TABLE: TBLPROPERTIES on an existing table are not " +
          "re-authored by REPLACE (its contents swap atomically, its metadata stays); " +
          "drop the clause")
      LakeWriter.overwriteDelta(df, path)
    } else {
      LakeWriter.writeDelta(df, path, partitionBy = partCols,
        configuration = properties)
    }
    Seq.empty
  }
}
