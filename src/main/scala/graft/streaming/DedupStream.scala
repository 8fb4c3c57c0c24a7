package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus dedup over a persisted MinHash signature index:
  * each arriving micro-batch is near-dup-checked against everything
  * seen so far ([[Dedup.minhashLshIncremental]] — probe cost scales
  * with the batch, old×old pairs are never re-generated), then its
  * pairs and signatures are appended. `foreachBatch` is the right
  * Structured Streaming shape here because the signature index must
  * outlive the query and stay shareable with batch jobs —
  * `flatMapGroupsWithState` state is per-key and query-private.
  *
  * Retries are idempotent: each batch writes `batch=<id>` directories
  * with overwrite, so a replayed micro-batch replaces its own output
  * instead of duplicating it (the checkpoint keeps batch ids stable).
  */
object DedupStream {

  def incrementalMinhash(docs: DataFrame, sigDir: String, pairsDir: String,
                         checkpoint: String, tau: Double): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val haveSigs = new java.io.File(sigDir).exists() &&
          new java.io.File(sigDir).listFiles() != null &&
          new java.io.File(sigDir).listFiles().nonEmpty
        val existing =
          if (haveSigs) s.read.parquet(sigDir).select("did", "sig", "sh")
          else Dedup.minhashSignatures(batch.limit(0))
        val b = batch.cache()
        Dedup.minhashLshIncremental(b, existing, tau)
          .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
        Dedup.minhashSignatures(b)
          .write.mode("overwrite").parquet(s"$sigDir/batch=$batchId")
        b.unpersist()
        ()
      }
      .start()
}
