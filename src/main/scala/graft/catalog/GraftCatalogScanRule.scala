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

  /** Re-root `r`'s attribute ids onto the reader plan's output. */
  private def splice(r: DataSourceV2Relation, name: String,
                     child: LogicalPlan): LogicalPlan = {
    val byName = child.output.map(a => a.name -> a).toMap
    val projected = r.output.map { attr =>
      val src = byName.getOrElse(attr.name, throw new IllegalStateException(
        s"GraftCatalog: column '${attr.name}' of $name is missing from the " +
          s"reader's output (${child.output.map(_.name).mkString(", ")}) — " +
          "catalog schema and log schema diverged"))
      Alias(src, attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
    }
    Project(projected, child)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val t = r.table.asInstanceOf[GraftTable]
      splice(r, t.name(), graft.sources.DeltaReader.read(spark, t.path, t.versionAsOf)
        .queryExecution.analyzed)
    // the FORMAT front door's handles ride the same one-engine splice.
    // Batch-only option refusals fire HERE, not at provider probe
    // time: the analyzer calls getTable for streams too (then falls
    // back to the V1 source), so stream-legal options must not blow up
    // the probe — but a BATCH read reaching this rule with them must
    // refuse rather than silently ignore what the caller asked for.
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftPathTable] =>
      val t = r.table.asInstanceOf[GraftPathTable]
      t.batchIllegal.foreach(msg => throw new IllegalArgumentException(msg))
      splice(r, t.name(), graft.sources.DeltaReader.read(spark, t.path, t.versionAsOf)
        .queryExecution.analyzed)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftCdfTable] =>
      val t = r.table.asInstanceOf[GraftCdfTable]
      t.batchIllegal.foreach(msg => throw new IllegalArgumentException(msg))
      val from = t.fromVersion.getOrElse(throw new IllegalArgumentException(
        "graft-delta: a batch readChangeFeed load requires startingVersion or " +
          "startingTimestamp (streams may omit it to start after the current version)"))
      splice(r, t.name(),
        graft.sources.DeltaReader.readChanges(spark, t.path, from, t.toVersion)
          .queryExecution.analyzed)
  }
}
