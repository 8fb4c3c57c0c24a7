package graft.streaming

import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of a persisted ANN index
  * ([[Similarity.writeAnnIndex]]): each arriving micro-batch of
  * vectors is encoded with the index's PERSISTED model — codebooks
  * never retrain mid-stream, the standard IVF discipline (retraining
  * would silently re-key every previously indexed vector) — and lands
  * as its own cell-partitioned `batch=<id>` directory. A replayed
  * micro-batch overwrites its own directory, so retries are
  * idempotent and the maintained index is exactly the union of
  * arrived batches; searches through [[Similarity.readAnnIndex]] /
  * `ivfPqSearch` see every batch and still prune unprobed cells.
  *
  * `foreachBatch`, not a stateful operator, for the same reason as
  * [[DedupStream]]: the index must outlive the query and stay
  * shareable with batch jobs.
  */
object AnnStream {

  def incrementalAnnIndex(vecs: DataFrame, indexPath: String, checkpoint: String,
                          id: String = "vec_id", vec: String = "embedding"): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val (model, _) = Similarity.readAnnIndex(s, indexPath)
        Similarity.encodePq(batch, model, id, vec)
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$indexPath/codes/batch=$batchId")
        ()
      }
      .start()
}
