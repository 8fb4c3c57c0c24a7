package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-VALUED functions over the graft Delta reader — the
  * surface a SQL-only user queries a Delta table with, no DataFrame
  * code and no connector jar:
  *
  *   SELECT * FROM graft_delta('/lake/events')
  *   SELECT * FROM graft_delta('/lake/events', 3)          -- versionAsOf
  *   SELECT * FROM graft_delta_changes('/lake/events', 1, 5) -- CDF window
  *
  * Injected through `spark.sql.extensions=graft.GraftExtensions`
  * (`injectTableFunction`): the builder resolves at ANALYSIS time into
  * the reader's analyzed plan, so everything downstream — pushdown,
  * partition pruning, the DV anti-join, column mapping — is the same
  * distributed scan the DataFrame API gets. Arguments must be literals
  * (the plan is built during analysis, before any row exists to
  * evaluate an expression against).
  */
object GraftTableFunctions {

  private def strArg(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a STRING literal (the plan is built at " +
          s"analysis time), got $other")
    }

  private def longArg(args: Seq[Expression], i: Int, fn: String): Long =
    args(i) match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an INTEGER literal, got $other")
    }

  /** graft_delta(path[, versionAsOf]) */
  def deltaPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      s"graft_delta(path[, versionAsOf]) takes 1-2 arguments, got ${args.size}")
    val path = strArg(args, 0, "graft_delta")
    val version = if (args.size == 2) Some(longArg(args, 1, "graft_delta")) else None
    val spark = SparkSession.active
    graft.sources.DeltaReader.read(spark, path, version).queryExecution.analyzed
  }

  /** graft_delta_rows(path) — a ROW-TRACKING table with its identities:
    * the table columns + _row_id + _row_commit_version.
    */
  def deltaRowsPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1, s"graft_delta_rows(path) takes 1 argument, got ${args.size}")
    val path = strArg(args, 0, "graft_delta_rows")
    val spark = SparkSession.active
    graft.sources.DeltaReader.readWithRowIds(spark, path).queryExecution.analyzed
  }

  /** graft_delta_history(path) — DESCRIBE HISTORY as a table: one row
    * per surviving log commit, newest first (version, operation,
    * readVersion, engineInfo; nulls for foreign commits).
    */
  def deltaHistoryPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1,
      s"graft_delta_history(path) takes 1 argument, got ${args.size}")
    val path = strArg(args, 0, "graft_delta_history")
    val spark = SparkSession.active
    graft.sources.DeltaReader.history(spark, path).queryExecution.analyzed
  }

  /** graft_delta_detail(path[, versionAsOf]) — DESCRIBE DETAIL as a
    * one-row table (format, id, location, version, partitionColumns,
    * numFiles, sizeInBytes, properties, protocol).
    */
  def deltaDetailPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      s"graft_delta_detail(path[, versionAsOf]) takes 1-2 arguments, got ${args.size}")
    val path = strArg(args, 0, "graft_delta_detail")
    val version = if (args.size == 2) Some(longArg(args, 1, "graft_delta_detail")) else None
    val spark = SparkSession.active
    graft.sources.DeltaReader.detail(spark, path, version).queryExecution.analyzed
  }

  /** graft_delta_files(path[, versionAsOf]) — the live file inventory
    * as a table: one row per add (path, partitionValues, size,
    * numRecords from add.stats, deletion-vector cardinality) — the
    * ops-debugging surface behind OPTIMIZE/VACUUM decisions. Driver
    * state is the snapshot's add list, the same maxSnapshotFiles-gated
    * bound every snapshot read carries.
    */
  def deltaFilesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.size <= 2,
      s"graft_delta_files(path[, versionAsOf]) takes 1-2 arguments, got ${args.size}")
    val path = strArg(args, 0, "graft_delta_files")
    val version = if (args.size == 2) Some(longArg(args, 1, "graft_delta_files")) else None
    val spark = SparkSession.active
    val snap = graft.sources.DeltaReader.snapshot(spark, path, version)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    import spark.implicits._
    snap.active.map { a =>
      val numRecords = a.stats.flatMap { s =>
        try Option(om.readTree(s).get("numRecords")).map(_.asLong)
        catch { case _: Exception => None }
      }
      (graft.sources.DeltaReader.percentDecode(a.path), a.partitionValues,
        a.size, numRecords, a.dv.map(_.cardinality))
    }.toDF("path", "partitionValues", "size", "numRecords", "dvCardinality")
      .queryExecution.analyzed
  }

  /** graft_delta_changes(path, fromVersion, toVersion) — the CDF
    * window as a table: the table columns + _change_type +
    * _commit_version + _commit_timestamp. Like delta-spark's
    * table_changes, the bounds may instead be TIMESTAMP STRINGS
    * ('2026-08-15 12:00:00' or epoch-millis-as-string is NOT
    * ambiguous: versions are numeric literals), resolved on the same
    * monotone commit-timestamp series as timestampAsOf.
    */
  def deltaChangesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 3,
      s"graft_delta_changes(path, from, to) takes 3 arguments, got ${args.size}")
    val path = strArg(args, 0, "graft_delta_changes")
    val spark = SparkSession.active
    def isString(i: Int) = args(i) match {
      case Literal(_, org.apache.spark.sql.types.StringType) => true
      case _ => false
    }
    if (isString(1) || isString(2)) {
      require(isString(1) && isString(2),
        "graft_delta_changes: mixed version/timestamp bounds — pass both as " +
          "versions (numbers) or both as timestamp strings")
      def ts(i: Int): Long = {
        val t = strArg(args, i, "graft_delta_changes").trim
        try java.sql.Timestamp.valueOf(t).getTime
        catch {
          case _: IllegalArgumentException =>
            try java.time.Instant.parse(t).toEpochMilli
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"graft_delta_changes: unparseable timestamp '$t' — use " +
                    "'yyyy-MM-dd HH:mm:ss[.fff]' or an ISO-8601 instant")
            }
        }
      }
      graft.sources.DeltaReader.readChangesTimestamp(spark, path, ts(1), ts(2))
        .queryExecution.analyzed
    } else {
      val from = longArg(args, 1, "graft_delta_changes")
      val to = longArg(args, 2, "graft_delta_changes")
      graft.sources.DeltaReader.readChanges(spark, path, from, to).queryExecution.analyzed
    }
  }
}
