package graft.streaming

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sink INTO the Delta table format with the protocol's own
  * exactly-once discipline: every micro-batch commits its data files
  * and a `txn` transaction identifier (appId, version = micro-batch
  * id) in ONE atomic log commit (delta-io/delta PROTOCOL.md
  * "Transaction Identifiers" — the same mechanism the real delta-spark
  * streaming sink uses). On restart or micro-batch retry the sink
  * consults the replayed watermark and SKIPS any batch at or below it,
  * so a batch that crashed after committing but before the query
  * checkpoint advanced lands exactly once instead of twice.
  *
  * The txn identity is SCOPED BY THE QUERY CHECKPOINT (the caller's
  * appId + a checkpoint-derived suffix), because batch ids only mean
  * anything within one checkpoint's offset log: delta-spark scopes by
  * the checkpoint-stored query id for the same reason. A new
  * checkpoint restarts batch ids at 0 over possibly NEW data — under
  * an unscoped appId those batches would sit below the old watermark
  * and be dropped as "replays", silently losing data.
  *
  * The first batch creates the table (schema + optional partitioning
  * from the stream); an EMPTY `_delta_log` left by a crash between
  * directory creation and the version-0 commit also takes the create
  * path ([[DeltaReader.hasLogEntries]]) — treating it as an existing
  * table would make every retry throw on the empty log, wedging the
  * stream forever. Later batches append through the snapshot-gated
  * append path, with ONE log replay per batch shared between the
  * watermark check and the append gate. A concurrent writer racing
  * the sink surfaces as the create-if-absent commit failure, never a
  * silent overwrite. Batch-scale work stays distributed (the staged
  * parquet write); only the KB-scale log commit is driver-side, which
  * is the format's own design.
  */
object DeltaStream {

  def writeDelta(stream: DataFrame, dir: String, checkpoint: String,
                 appId: String, checkpointInterval: Int = 0,
                 partitionBy: Seq[String] = Nil): StreamingQuery = {
    val scoped = scopedAppId(appId, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        commitBatch(batch.toDF(), dir, scoped, batchId,
          checkpointInterval, partitionBy)
      }
      .start()
  }

  /** appId + checkpoint-identity suffix (the DedupStream/AnnStream
    * batch-scoping discipline applied to txn identifiers).
    */
  private[graft] def scopedAppId(appId: String, checkpoint: String): String = {
    val scope = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"$appId-$scope"
  }

  /** Streaming UPSERT sink: each micro-batch MERGEs into the table on
    * `keyCols` (matched target rows replaced by the batch row,
    * unmatched batch rows inserted) under the SAME txn exactly-once
    * discipline as [[writeDelta]] — the CDC-apply shape: a change
    * stream keyed by primary key lands as a continuously-upserted
    * table instead of an append log. The batch must carry ONE row per
    * key ([[graft.sources.LakeWriter.mergeInto]]'s ambiguity refusal)
    * — aggregate to last-event-per-key upstream (e.g. a
    * max_by/window), exactly as real MERGE demands. The first batch
    * creates the table.
    */
  def upsertDelta(stream: DataFrame, dir: String, checkpoint: String,
                  appId: String, keyCols: Seq[String],
                  partitionBy: Seq[String] = Nil): StreamingQuery = {
    val scoped = scopedAppId(appId, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        upsertBatch(batch.toDF(), dir, scoped, batchId, keyCols, partitionBy)
      }
      .start()
  }

  /** One micro-batch's exactly-once MERGE — [[commitBatch]]'s
    * arbitration with the append swapped for [[LakeWriter.mergeInto]].
    */
  private[graft] def upsertBatch(batch: DataFrame, dir: String, appId: String,
                                 batchId: Long, keyCols: Seq[String],
                                 partitionBy: Seq[String] = Nil): Unit = {
    val s = batch.sparkSession
    val hconf = s.sessionState.newHadoopConf()
    val live = DeltaReader.isDeltaTable(dir, hconf) &&
      DeltaReader.hasLogEntries(dir, hconf)
    if (!live) {
      LakeWriter.writeDelta(batch, dir, checkpointInterval = 0,
        partitionBy, Some(appId -> batchId))
    } else {
      val snap = DeltaReader.snapshot(s, dir, None)
      if (batchId > snap.txns.getOrElse(appId, -1L))
        LakeWriter.mergeInto(s, dir, batch, keyCols, Some(appId -> batchId))
      // else: replay of an already-committed batch — exactly-once skip
    }
  }

  /** One micro-batch's exactly-once commit — factored out of the
    * foreachBatch closure so the skip/append/create arbitration is
    * directly testable.
    */
  private[graft] def commitBatch(batch: DataFrame, dir: String, appId: String,
                                 batchId: Long, checkpointInterval: Int = 0,
                                 partitionBy: Seq[String] = Nil): Unit = {
    val s = batch.sparkSession
    val hconf = s.sessionState.newHadoopConf()
    val live = DeltaReader.isDeltaTable(dir, hconf) &&
      DeltaReader.hasLogEntries(dir, hconf)
    if (!live) {
      LakeWriter.writeDelta(batch, dir, checkpointInterval,
        partitionBy, Some(appId -> batchId))
    } else {
      val snap = DeltaReader.snapshot(s, dir, None)
      if (batchId > snap.txns.getOrElse(appId, -1L))
        LakeWriter.appendDeltaWithSnapshot(batch, dir, checkpointInterval,
          Some(appId -> batchId), snap)
      // else: replay of an already-committed batch — exactly-once skip
    }
  }
}
