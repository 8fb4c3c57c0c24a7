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

  /** Deterministic weighted sampling WITHOUT replacement via the
    * Gumbel-top-k trick (the generic form of `Dsir.resampleFromWeights`,
    * for ANY positive weight column — quality scores, lengths, domain
    * priors): ranking by ln(w) + Gumbel(id) draws k rows from
    * p(i) ∝ w_i without replacement, and the Gumbel noise is a pure
    * function of md5(id) — reproducible across runs, engines and
    * retries, never `rand()`. The whole plan is one per-row projection
    * + a global top-k (TakeOrderedAndProject — per-partition k-heaps,
    * no full sort). Rows with weight <= 0 have probability 0 and are
    * filtered. Output: (id, weight, key) for the k picks, key rounded
    * to 6 decimals, ties broken by id.
    */
  def weightedSample(df: DataFrame, id: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"weightedSample: k $k must be positive")
    val u = (conv(substring(md5(col(id).cast("string")), 1, 8), 16, 10).cast("double") + 0.5) /
      4294967296.0
    val gumbel = -log(-log(u))
    val w = weight.cast("double")
    df.where(w > 0)
      .select(col(id), w.as("weight"), round(log(w) + gumbel, 6).as("key"))
      .orderBy(col("key").desc, col(id))
      .limit(k)
  }

  /** Temperature-flattened mixing sample (the multilingual/source
    * balancing rule LLM pipelines use, e.g. α = 0.3 in mBERT/XLM-R
    * sampling): stratum s gets a quota ∝ n_s^α of `targetN` rows —
    * α = 1 reproduces the natural distribution, α = 0 gives uniform
    * per-stratum quotas, in between flattens skew so head strata stop
    * drowning the tail. Rows inside a stratum are taken in md5(id)
    * order, so the sample is deterministic and engine-reproducible
    * (the same discipline as [[stratifiedHashSample]] / `corpus_mix`).
    * The share is rounded to 9 decimals before the quota floor so the
    * Spark and oracle float sums cannot disagree on a boundary.
    *
    * Plan: one tiny stratum-count aggregate broadcast back, one
    * rank-window per stratum — the same single exchange `corpus_mix`
    * pays. Output: input columns + rk (1-based pick order).
    */
  def temperatureMix(df: DataFrame, stratum: String, targetN: Long, alpha: Double,
                     id: String = "doc_id"): DataFrame = {
    require(targetN > 0 && alpha >= 0.0 && alpha <= 1.0,
      s"need targetN > 0 and alpha in [0,1], got $targetN, $alpha")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).cast("double").as("__n"))
    // z via an unpartitioned window OVER THE COUNT TABLE (stratum-sized,
    // tiny) — not a second aggregation subtree, which would re-scan the
    // corpus: this keeps the whole quota computation at one corpus scan
    val zw = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val quotas = counts
      .select(col(stratum),
        least(col("__n"),
          floor(lit(targetN.toDouble) *
            round(pow(col("__n"), alpha) / sum(pow(col("__n"), alpha)).over(zw), 9)))
          .cast("long").as("__quota"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(stratum))
      .orderBy(md5(col(id).cast("string")), col(id))
    df.join(broadcast(quotas), stratum)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("__quota"))
      .drop("__quota")
  }
}
