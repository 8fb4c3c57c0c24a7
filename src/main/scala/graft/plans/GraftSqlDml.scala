package graft.plans

import graft.sources.LakeWriter
import org.apache.spark.sql.{GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
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
  * MERGE supports exactly the writer's upsert contract: an
  * equality-conjunction ON clause (the key columns), `WHEN MATCHED
  * THEN UPDATE SET *`, `WHEN NOT MATCHED THEN INSERT *`. Any other
  * merge shape (conditional clauses, column-wise SET, DELETE actions,
  * NOT MATCHED BY SOURCE) refuses loudly with the supported form —
  * never a silently-different merge.
  *
  * Alias hygiene: `DELETE FROM graft_delta.`/d` AS t WHERE t.k = 1`
  * strips the `t.` qualifier before handing the predicate to the
  * writer (the writer's `where` runs against the bare table columns).
  * Struct-field access keeps working — only the statement's declared
  * alias is stripped.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlDml.rewrite(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
                                       context: ParameterContext): LogicalPlan =
    GraftSqlDml.rewrite(delegate.parsePlanWithParameters(sqlText, context))

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

  /** The graft table target: `graft_delta`.`<path>`, optionally under
    * an alias. Returns (path, alias).
    */
  private object GraftTarget {
    def unapply(plan: LogicalPlan): Option[(String, Option[String])] = plan match {
      case SubqueryAlias(ident, child) =>
        unapply(child).map { case (p, _) => (p, Some(ident.name)) }
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graft_delta") =>
        Some((u.multipartIdentifier(1), None))
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
        s"graft_delta MERGE supports exactly: equality-conjunction ON + " +
          "WHEN MATCHED THEN UPDATE SET * + WHEN NOT MATCHED THEN INSERT * " +
          s"(the writer's upsert contract); $why. Statement: ${m.simpleString(5)}")
      if (withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION is not supported")
      if (bySource.nonEmpty) refuse("NOT MATCHED BY SOURCE is not supported")
      matched match {
        case Seq(UpdateStarAction(None)) => ()
        case other => refuse(s"unsupported matched actions $other")
      }
      notMatched match {
        case Seq(InsertStarAction(None)) => ()
        case other => refuse(s"unsupported not-matched actions $other")
      }
      val keys = conjuncts(onCond).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
          a.nameParts.last
        case other => refuse(s"ON clause term '${other.sql}' is not t.col = s.col")
      }
      GraftMergeCommand(path, source, keys)
    case i @ InsertIntoStatement(GraftTarget(path, _), partitionSpec,
        userSpecifiedCols, query, overwrite, ifPartitionNotExists, byName) =>
      def refuse(why: String): Nothing = throw new UnsupportedOperationException(
        s"graft_delta INSERT supports exactly: INSERT [OVERWRITE] [BY NAME] " +
          "with a full-width row set (optionally naming ALL table columns); " +
          s"$why. Statement: ${i.simpleString(5)}")
      if (partitionSpec.nonEmpty)
        refuse("PARTITION clauses are not supported — the table's own declared " +
          "partitioning governs layout")
      if (ifPartitionNotExists) refuse("IF NOT EXISTS is not supported")
      GraftInsertCommand(path, query, userSpecifiedCols, overwrite, byName)
    case other => other
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

/** `DELETE FROM graft_delta.`path` WHERE ...` */
case class GraftDeleteCommand(path: String, predicate: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.deleteWhere(spark, path, predicate)
    Seq.empty
  }
}

/** `UPDATE graft_delta.`path` SET ... [WHERE ...]` */
case class GraftUpdateCommand(path: String, predicate: String,
                              sets: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.updateWhere(spark, path, predicate, sets.toMap)
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
                              byName: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val tableCols = graft.sources.DeltaReader.snapshot(spark, path, None) match {
      case snap => org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
        .asInstanceOf[StructType].fieldNames.toSeq
    }
    val src = GraftColumnBridge.ofRows(spark, source)
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"graft_delta INSERT into $path: $why (table columns: " +
        s"${tableCols.mkString(", ")}; source columns: " +
        s"${src.columns.mkString(", ")})")
    val aligned =
      if (userCols.nonEmpty) {
        // INSERT INTO t (a, b, c): the list names ALL table columns in
        // the SOURCE's positional order; realign to table order by name
        if (userCols.length != src.columns.length)
          refuse(s"column list names ${userCols.length} columns but the source " +
            s"produces ${src.columns.length}")
        val missing = tableCols.filterNot(t => userCols.exists(_.equalsIgnoreCase(t)))
        if (missing.nonEmpty)
          refuse(s"column list omits ${missing.mkString(", ")} — partial-width " +
            "inserts are not supported")
        val renamed = src.toDF(userCols: _*)
        renamed.select(tableCols.map(renamed.col): _*)
      } else if (byName) {
        val missing = tableCols.filterNot(t => src.columns.exists(_.equalsIgnoreCase(t)))
        if (missing.nonEmpty)
          refuse(s"BY NAME source lacks ${missing.mkString(", ")}")
        src.select(tableCols.map(src.col): _*)
      } else {
        // positional: Spark SQL semantics — source names are ignored
        if (src.columns.length != tableCols.length)
          refuse(s"source produces ${src.columns.length} columns, table has " +
            s"${tableCols.length}")
        src.toDF(tableCols: _*)
      }
    if (overwrite) LakeWriter.overwriteDelta(aligned, path)
    else LakeWriter.appendDelta(aligned, path)
    Seq.empty
  }
}

/** `MERGE INTO graft_delta.`path` USING ... ON keys...` — the source
  * sub-plan resolves lazily at run time (it may itself read graft
  * TVFs), then routes to the writer's keyed upsert.
  */
case class GraftMergeCommand(path: String, source: LogicalPlan, keys: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    LakeWriter.mergeInto(spark, path, GraftColumnBridge.ofRows(spark, source), keys)
    Seq.empty
  }
}
