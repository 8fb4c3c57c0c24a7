package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation.
  *
  * Hash-based, not `rand()`: the keep decision is a pure function of the
  * row key, so the sample is reproducible across runs, executors and
  * engines (the DuckDB oracle applies the same predicate), survives
  * retries, and needs NO shuffle — it is a plain filter the optimizer can
  * push around.
  */
object Sampling {

  /** First hex digit of md5(key) as 0..15 — a uniform 4-bit hash shared
    * verbatim by Spark and the SQL oracle.
    */
  def hexBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 1), 16, 10).cast("int")

  /** Keep rows where hexBucket(key) < rate/16, with a per-stratum rate:
    * `rates` maps stratum value → numerator (0..16); others use
    * `defaultRate`. Stratified sampling as one stateless filter.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (v, r)) =>
      when(stratum === v, lit(r)).otherwise(acc)
    }
    df.where(hexBucket(key) < rateCol)
  }
}
