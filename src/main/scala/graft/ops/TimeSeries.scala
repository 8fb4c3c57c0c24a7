package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling over event streams.
  *
  * `gapFill` is the operator monitoring/feature pipelines reach for
  * when "no events that hour" must be a ROW, not an absence: bucket the
  * stream, then materialize every bucket in each key's [min, max] span
  * — empty buckets appear with zero counts, a `filled` flag, and a
  * last-observation-carried-forward value for the metrics where "no
  * new reading" means "previous reading still holds".
  *
  * Scale: one bucketing aggregation, one tiny per-key span aggregate
  * whose `sequence` explode generates keys×span rows (the OUTPUT size —
  * inherent to densification, not a plan artifact; pick the key
  * accordingly), one left join back, one per-key window for LOCF. Sums
  * stay decimal-exact for engine-independent results.
  */
object TimeSeries {

  /** Per-key gap-filled hourly-style resample. `tsNanos` is a long
    * nanosecond timestamp column; `bucketNanos` the bucket width.
    * Output: (key, bucket_start — bucket index × bucketNanos/10^9 in
    * SECONDS, cnt, sum_value, filled, locf_sum). `locf_sum` is null
    * until the key's first observed bucket.
    */
  def gapFill(df: DataFrame, key: String, tsNanos: String, value: Column,
              bucketNanos: Long = 3600L * 1000 * 1000 * 1000): DataFrame = {
    require(bucketNanos > 0 && bucketNanos % 1000000000L == 0,
      s"bucketNanos $bucketNanos must be a positive whole-second width")
    val dec = "decimal(28,2)"
    val agg = df
      .groupBy(col(key), expr(s"$tsNanos DIV ${bucketNanos}L").as("__b"))
      .agg(count(lit(1)).as("cnt"),
        sum(value.cast("decimal(18,2)")).cast(dec).as("sum_value"))
    val span = agg.groupBy(col(key))
      .agg(min(col("__b")).as("__b0"), max(col("__b")).as("__b1"))
    val grid = span.select(col(key),
      explode(sequence(col("__b0"), col("__b1"))).as("__b"))
    val w = Window.partitionBy(col(key)).orderBy(col("__b"))
    grid.join(agg, Seq(key, "__b"), "left")
      .select(col(key),
        (col("__b") * (bucketNanos / 1000000000L)).as("bucket_start"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("sum_value"), lit(0).cast(dec)).cast(dec).as("sum_value"),
        col("cnt").isNull.as("filled"),
        last(col("sum_value"), ignoreNulls = true).over(w).cast(dec).as("locf_sum"))
  }
}
