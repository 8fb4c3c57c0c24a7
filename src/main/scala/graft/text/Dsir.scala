package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents that look like a TARGET corpus by
  * importance weights over hashed n-gram features. The published
  * recipe, re-expressed relationally:
  *
  *   1. hash every unigram+bigram of both corpora into `buckets`
  *      buckets (the hashing trick — fixed feature width, no
  *      vocabulary fit),
  *   2. fit bag-of-buckets models p_target and p_raw with add-one
  *      smoothing (two bucket-count aggregations, each at most
  *      `buckets` rows),
  *   3. per raw document, log importance weight
  *      log w(x) = Σ_features [log p_target(b) − log p_raw(b)]
  *      (one broadcast join of the `buckets`-row ratio table onto the
  *      exploded features, one grouped sum),
  *   4. Gumbel-top-k resampling: rank by log w(x) + g_x where g_x is
  *      a deterministic per-doc Gumbel draw (−ln(−ln u), u from
  *      md5(doc_id)) — sampling WITHOUT replacement from the softmax
  *      of the weights, the paper's estimator, reproducible across
  *      engines and runs.
  *
  * Scale: the feature explode is the standard tokenize shuffle, the
  * model tables are bounded by `buckets` (8k rows default — always
  * broadcastable), and the resample is one global top-k. Nothing is
  * corpus-proportional on the driver.
  *
  * The bucket hash is md5-based (first 8 hex digits mod `buckets`) so
  * the DuckDB oracle reproduces it exactly; swapping in xxhash64 for
  * production throughput changes only `bucketOf`.
  */
object Dsir {

  /** Feature bucket ids — first 8 md5 hex digits of each unigram+bigram
    * as an unsigned int, mod `buckets` (cross-engine reproducible;
    * DuckDB: ('0x'||substr(md5(f),1,8))::BIGINT). Computed by the
    * codegen'd [[graft.functions.DsirKernel]]: the equivalent
    * explode(concat(words, zip_with(...))) + conv(substring(md5(f)))
    * chain pays an interpreted higher-order function and five
    * allocations per feature on the corpus-scale path (measured ~2× on
    * the whole weight fit); the kernel is bit-identical by construction
    * and pinned to the relational form by DsirSpec.
    */
  private def featureBuckets(text: Column, buckets: Int): Column =
    graft.functions.DsirKernel.featureBucketsCol(text, buckets)

  /** (bucket, cnt) for one corpus — at most `buckets` rows. */
  private def bucketCounts(docs: DataFrame, text: String, buckets: Int): DataFrame =
    docs.select(explode(featureBuckets(col(text), buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))

  /** Per-raw-document DSIR log importance weight. Output: (doc_id,
    * n_feats, logweight) — logweight rounded to 6 decimals (the sums
    * are associative-stable well past that).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, buckets: Int = 8192,
                        id: String = "doc_id", text: String = "text"): DataFrame = {
    require(buckets > 0, s"dsir: buckets $buckets must be positive")
    val tc = bucketCounts(target, text, buckets)
    val rc = bucketCounts(raw, text, buckets)
    // add-one smoothing over the FULL bucket space: p(b) = (cnt+1) /
    // (total + buckets). The log-ratio table is built with one outer
    // join of the two count tables plus their totals — never wider
    // than `buckets` rows.
    val tTot = tc.agg(sum("cnt").cast("double").as("t_tot"))
    val rTot = rc.agg(sum("cnt").cast("double").as("r_tot"))
    val ratio = tc.withColumnRenamed("cnt", "t_cnt")
      .join(rc.withColumnRenamed("cnt", "r_cnt"), Seq("b"), "full_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"),
        (log((coalesce(col("t_cnt"), lit(0L)).cast("double") + 1.0) /
          (col("t_tot") + buckets.toDouble)) -
          log((coalesce(col("r_cnt"), lit(0L)).cast("double") + 1.0) /
            (col("r_tot") + buckets.toDouble))).as("logratio"))
    raw.select(col(id), explode(featureBuckets(col(text), buckets)).as("b"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("logratio")), 6).as("logweight"))
  }

  /** Gumbel-top-k importance RESAMPLE: the `k` raw docs ranked by
    * logweight + Gumbel(doc_id) — a deterministic draw from the
    * softmax of the importance weights, without replacement. Output:
    * (doc_id, logweight, key), key rounded to 6 decimals, ordered for
    * the top-k only (ties broken by doc_id).
    */
  def resample(raw: DataFrame, target: DataFrame, k: Int, buckets: Int = 8192,
               id: String = "doc_id", text: String = "text"): DataFrame =
    resampleFromWeights(importanceWeights(raw, target, buckets, id, text), k, id)

  /** The Gumbel-top-k rank applied to an ALREADY-computed (and
    * possibly cached/persisted) `importanceWeights` result — weight
    * fitting is the expensive pass, the draw is a per-row expression.
    */
  def resampleFromWeights(weights: DataFrame, k: Int,
                          id: String = "doc_id"): DataFrame = {
    require(k > 0, s"dsir: k $k must be positive")
    // u in (0,1) from the first 8 md5 hex digits of the doc id —
    // never exactly 0 or 1, so the double log is finite
    val u = (conv(substring(md5(col(id).cast("string")), 1, 8), 16, 10).cast("double") + 0.5) /
      4294967296.0
    val gumbel = -log(-log(u))
    weights.select(col(id), col("logweight"),
        round(col("logweight") + gumbel, 6).as("key"))
      .orderBy(col("key").desc, col(id))
      .limit(k)
  }
}
