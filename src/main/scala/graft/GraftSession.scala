package graft

import org.apache.spark.sql.SparkSession

/** Common session tuning for all graft entry points.
  *
  * - `nanosAsLong`: the testdata `events` table stores parquet
  *   TIMESTAMP(NANOS), which Spark can only read as long nanos.
  * - AQE handles skew joins and partition coalescing at runtime — the
  *   static shuffle partition count is a ceiling, not a plan constant.
  */
object GraftSession {
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
}
