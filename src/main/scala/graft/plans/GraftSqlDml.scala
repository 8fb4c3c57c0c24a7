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
