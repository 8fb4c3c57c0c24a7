package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Table handles for the FORMAT front door —
  * `spark.read.format("graft-delta").load(path)` — the batch twin of
  * the streaming source and the delta-spark API a switching user
  * expects. Like [[GraftTable]] they are pure metadata: reads
  * substitute the one production DeltaReader plan via
  * [[GraftCatalogScanRule]] during ANALYSIS, so the planner never asks
  * for a ScanBuilder. They still declare BATCH_READ (unlike the
  * catalog handle) because `DataFrameReader.load`'s V2 path checks
  * capabilities BEFORE analysis ever runs — `newScanBuilder` then
  * refuses loudly if the substitution rule isn't installed, instead of
  * silently scanning nothing.
  */
private[graft] trait GraftMetadataOnlyRead extends SupportsRead { self: Table =>
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      s"graft-delta: ${name()} reads substitute the DeltaReader plan via " +
        "GraftCatalogScanRule before planning — add graft.GraftExtensions to " +
        "spark.sql.extensions")
}

/** `spark.read.format("graft-delta")[.option("versionAsOf"|"timestampAsOf", …)].load(path)`
  *
  * `batchIllegal` defers option refusals that only apply to BATCH
  * reads: the analyzer probes `getTable` for STREAMS too (before
  * falling back to the V1 source on the missing streaming
  * capability), so stream-legal options like `startingVersion` must
  * not throw at probe time — the scan rule throws them exactly when a
  * batch read would otherwise silently ignore the option.
  */
final case class GraftPathTable(spark: SparkSession, path: String,
                                versionAsOf: Option[Long],
                                batchIllegal: Option[String] = None)
    extends Table with GraftMetadataOnlyRead {
  private lazy val snap = graft.sources.DeltaReader.snapshot(spark, path, versionAsOf)
  override def name(): String = s"graft-delta.`$path`" +
    versionAsOf.map(v => s"@v$v").getOrElse("")
  override def schema(): StructType =
    try {
      val raw = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
        .asInstanceOf[StructType]
      StructType(raw.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    } catch {
      // a handle carrying a deferred refusal (e.g. a missing table)
      // answers an empty schema so load()'s analysis reaches the scan
      // rule, which throws the REAL message; a healthy handle's
      // resolution failure still surfaces as-is
      case scala.util.control.NonFatal(_) if batchIllegal.isDefined => new StructType()
    }
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()
}

/** `spark.read.format("graft-delta").option("readChangeFeed", "true")
  * .option("startingVersion"|"startingTimestamp", …)
  * [.option("endingVersion"|"endingTimestamp", …)].load(path)` — the
  * CDF window as a batch DataFrame, version bounds resolved ONCE at
  * load (timestamps on the same monotone series as timestampAsOf).
  */
final case class GraftCdfTable(spark: SparkSession, path: String,
                               fromVersion: Option[Long], toVersion: Long,
                               batchIllegal: Option[String] = None)
    extends Table with GraftMetadataOnlyRead {
  override def name(): String =
    s"graft-delta.`$path`@changes(${fromVersion.getOrElse("?")},$toVersion)"
  override def schema(): StructType =
    graft.streaming.GraftDeltaSource.sourceSchema(spark, path, cdf = true)
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()
}
