package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination check for training corpora: how much of each
  * training document's n-gram set also appears in an evaluation
  * (benchmark) set. Standard decontamination step before LLM training —
  * a doc sharing a large shingle fraction with the benchmark leaks test
  * data.
  *
  * Scale shape: the benchmark is inherently small next to the corpus, so
  * its distinct shingle set is BROADCAST — the corpus-side inverted
  * index never shuffles; the only aggregation is per-doc counting.
  */
object Contamination {

  /** Per-corpus-doc overlap with the benchmark shingle set.
    * Output: (doc_id, n_shingles, n_shared, share, contaminated) — share
    * is n_shared/n_shingles (0 when the doc is too short to shingle).
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame, tau: Double,
                   n: Int = 3, id: String = "doc_id", text: String = "text"): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(text), n)).as("g")).distinct()
    val inv = corpus
      .select(col(id), Dedup.shingles(col(text), n).as("sh")) // shingle UDF once per row
      .select(col(id), size(col("sh")).as("n_shingles"), explode_outer(col("sh")).as("g"))
    val hit = inv.join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("g"), "left")
    hit.groupBy(col(id), col("n_shingles"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_shared"))
      .withColumn("share",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_shingles").cast("double"), 6)))
      .withColumn("contaminated", col("share") >= tau)
  }
}
