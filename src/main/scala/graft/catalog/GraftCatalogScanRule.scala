package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule: a resolved [[GraftTable]] relation becomes the
  * production DeltaReader plan. The catalog hands the analyzer a
  * metadata-only table; this rule splices in the REAL read — log
  * replay, stats pruning, DV anti-join, column mapping, time travel —
  * as the relation's implementation, aliased onto the relation's
  * attribute ids so every reference above keeps resolving. After the
  * swap no DSv2 relation remains, so Spark never asks the table for a
  * ScanBuilder; there is exactly one reader implementation for every
  * front door (DataFrame API, TVFs, catalog names).
  */
class GraftCatalogScanRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val t = r.table.asInstanceOf[GraftTable]
      val child = graft.sources.DeltaReader.read(spark, t.path, t.versionAsOf)
        .queryExecution.analyzed
      val byName = child.output.map(a => a.name -> a).toMap
      val projected = r.output.map { attr =>
        val src = byName.getOrElse(attr.name, throw new IllegalStateException(
          s"GraftCatalog: column '${attr.name}' of ${t.name()} is missing from the " +
            s"reader's output (${child.output.map(_.name).mkString(", ")}) — " +
            "catalog schema and log schema diverged"))
        Alias(src, attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
      }
      Project(projected, child)
  }
}
