package graft.streaming

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sink INTO the Delta table format with the protocol's own
  * exactly-once discipline: every micro-batch commits its data files
  * and a `txn` transaction identifier (appId = the sink's identity,
  * version = the micro-batch id) in ONE atomic log commit
  * (delta-io/delta PROTOCOL.md "Transaction Identifiers" — the same
  * mechanism the real delta-spark streaming sink uses). On restart or
  * micro-batch retry the sink consults the replayed watermark
  * ([[DeltaReader.lastTxnVersion]]) and SKIPS any batch at or below
  * it, so a batch that crashed after committing but before the query
  * checkpoint advanced lands exactly once instead of twice.
  *
  * The first batch creates the table (schema + optional partitioning
  * from the stream), later batches append through the snapshot-gated
  * [[LakeWriter.appendDelta]] — a concurrent writer racing the sink
  * surfaces as the create-if-absent commit failure, never a silent
  * overwrite. Batch-scale work stays distributed (the staged parquet
  * write); only the KB-scale log commit is driver-side, which is the
  * format's own design.
  */
object DeltaStream {

  def writeDelta(stream: DataFrame, dir: String, checkpoint: String,
                 appId: String, checkpointInterval: Int = 0,
                 partitionBy: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        val exists = DeltaReader.isDeltaTable(dir,
          s.sessionState.newHadoopConf())
        if (!exists) {
          LakeWriter.writeDelta(batch.toDF(), dir, checkpointInterval,
            partitionBy, Some(appId -> batchId))
        } else if (batchId > DeltaReader.lastTxnVersion(s, dir, appId)) {
          LakeWriter.appendDelta(batch.toDF(), dir, checkpointInterval,
            Some(appId -> batchId))
        } // else: replay of an already-committed batch — exactly-once skip
        ()
      }
      .start()
}
