package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column lake profiling — the metadata pass a lake catalog runs on
  * ingest (row counts, distincts, null rates, extrema). One scan via
  * native unpivot, one aggregation; no per-column jobs.
  */
object Profiler {

  /** Output: (column, n_rows, n_nulls, n_distinct, min_v, max_v) with
    * extrema on the string form (type-uniform and engine-stable).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => col(c).cast("string").as(c)): _*)
      .unpivot(Array.empty[org.apache.spark.sql.Column], cols.map(col).toArray, "column", "value")
      .groupBy("column")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
}
