package graft.streaming

import graft.sources.DeltaReader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming SOURCE from the Delta table format — the read-side twin
  * of [[DeltaStream]]'s sink: tail the `_delta_log` incrementally, one
  * micro-batch per poll, each batch the distributed parquet scan of
  * the `add` files committed since the checkpointed watermark.
  *
  * Change semantics (append-only tailing, no CDF):
  *  - only `dataChange = true` adds are delivered — a compaction
  *    commit (dataChange=false adds + removes) is pure layout movement
  *    and contributes NOTHING to the stream, which is exactly why the
  *    sink's compaction marks itself dataChange=false;
  *  - a `dataChange = true` remove means rows were DELETED or
  *    rewritten, which an append-only tail cannot represent — refused
  *    loudly instead of silently streaming a wrong delta, unless the
  *    caller opted into `ignoreDeletes` (skip delete-only versions —
  *    the partition-boundary retention case) or `skipChangeCommits`
  *    (skip every changing version), delta-spark's mutation-tolerance
  *    options;
  *  - versions whose commit JSON was retention-cleaned are refused
  *    (checkpoints are snapshots, not change lists) — size the log
  *    retention to the maximum expected consumer lag, exactly as real
  *    Delta's `logRetentionDuration` contract demands.
  *
  * Delivery is at-least-once from this source's point of view (the
  * watermark advances AFTER `process` returns) and exactly-once
  * END-TO-END when the sink dedups on the batch version — e.g.
  * [[DeltaStream.commitBatch]] with this source's version as the txn
  * version, giving a Delta→Delta pipeline the same idempotence
  * discipline on both ends.
  *
  * Scale: each poll's driver work is O(new versions) KB-scale JSON
  * parses + one snapshot replay (bounded by checkpointInterval); the
  * data path is the same distributed scan as the batch reader
  * (column-mapping remap included). The initial batch is the full
  * current snapshot — the same "initial snapshot then tail" shape as
  * delta-spark's streaming source.
  */
object DeltaTail {

  /** New rows committed in versions (fromVersion, toVersion]:
    * dataChange=true adds only, scanned under `toVersion`'s metadata —
    * or per-version under each version's OWN metadata when the window
    * crosses a column-mapping transition (whose re-keyed files the
    * single scan would null-misread; the logical names are
    * transition-invariant, so the slices union).
    * Refuses dataChange=true removes (deletes need CDF, not a tail)
    * and DV-carrying new adds (a file BORN with deleted rows is a
    * rewrite product, not an append) — unless the caller opted into
    * delta-spark's mutation tolerance:
    *  - `ignoreDeletes` skips DELETE-ONLY versions (removes, no adds —
    *    the retention/GDPR case: rows leave the table but nothing is
    *    rewritten, so the tail's append semantics stay exact for the
    *    surviving data);
    *  - `skipChangeCommits` skips ENTIRE versions that remove data
    *    (updates/merges/rewrites too) — the stream delivers only
    *    pure-append commits, the documented contract for tailing a
    *    table that mutates.
    */
  def changes(s: SparkSession, dir: String, fromVersion: Long, toVersion: Long,
              ignoreDeletes: Boolean = false,
              skipChangeCommits: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"changes: fromVersion $fromVersion > toVersion $toVersion")
    val snap = DeltaReader.snapshot(s, dir, Some(toVersion))
    val perVersion = ((fromVersion + 1) to toVersion).flatMap { v =>
      val (adds, removes) = DeltaReader.commitChanges(s, dir, v)
      val deletes = removes.filter(_._2)
      val dcAdds = adds.filter(_._2)
      if (deletes.nonEmpty && skipChangeCommits) Nil
      else if (deletes.nonEmpty && ignoreDeletes && dcAdds.isEmpty) Nil
      else {
        require(deletes.isEmpty,
          s"version $v of $dir removes ${deletes.size} files with dataChange=true " +
            "(a delete/rewrite) — an append-only tail cannot represent it; " +
            "refusing to stream a wrong delta (option ignoreDeletes skips " +
            "delete-only versions; skipChangeCommits skips every changing version)")
        if (dcAdds.isEmpty) Nil else Seq(v -> dcAdds.map(_._1))
      }
    }
    val newAdds = perVersion.flatMap(_._2)
    newAdds.foreach { a =>
      require(a.dv.isEmpty,
        s"version range ($fromVersion, $toVersion] adds ${a.path} carrying a deletion " +
          "vector — a rewrite product, not an append; refusing to stream it")
    }
    // a column-mapping REMOVAL inside the window re-keys files: adds
    // from versions before it carry the OLD physical names, which
    // toVersion's logical scan schema would silently null-misread
    // (r17 repro, the readChanges class). The tail can deliver it
    // CORRECTLY though: each version's adds scan under that version's
    // OWN metadata and the slices union by the (transition-invariant)
    // logical names — one scan per version only on windows that
    // actually cross a transition, the homogeneous fast path otherwise.
    // the in-window restatement walk, not endpoint comparison: a
    // removal + re-upgrade leaves the endpoints agreeing while
    // mid-window adds are keyed by a mapping toVersion's metadata no
    // longer carries (DeltaReader.cmTransitionBreak)
    val crossesCm =
      DeltaReader.cmTransitionBreak(s, dir, fromVersion, toVersion, snap).nonEmpty
    if (!crossesCm) DeltaReader.scanFiles(s, dir, snap, newAdds)
    else perVersion.map { case (v, adds) =>
      DeltaReader.scanFiles(s, dir, DeltaReader.snapshot(s, dir, Some(v)), adds)
    }.reduceOption(_ unionByName _)
      .getOrElse(DeltaReader.scanFiles(s, dir, snap, Nil))
  }

  /** One micro-batch poll: deliver everything committed since the
    * watermark in `checkpoint` to `process(batch, version)`, then
    * advance the watermark. The FIRST poll delivers the full current
    * snapshot (initial load), later polls the incremental changes;
    * returns the delivered version, or None when there was nothing
    * new. A poll that crashes inside `process` redelivers on retry —
    * pair with a version-deduping sink for exactly-once.
    */
  /** `maxVersionsPerTrigger` caps how many log versions one poll
    * delivers — a tail starting far behind a hot table catches up in
    * bounded batches instead of one giant one. This poll API keeps the
    * initial snapshot as ONE batch (one consistent version); the
    * registered streaming source ([[GraftDeltaSource]]) additionally
    * splits it by maxFilesPerTrigger/maxBytesPerTrigger with
    * restart-safe offsets — prefer readStream for huge tables.
    */
  def pollOnce(s: SparkSession, dir: String, checkpoint: String,
               process: (DataFrame, Long) => Unit,
               maxVersionsPerTrigger: Option[Int] = None): Option[Long] = {
    maxVersionsPerTrigger.foreach(m => require(m > 0,
      s"maxVersionsPerTrigger $m must be positive"))
    val hconf = s.sessionState.newHadoopConf()
    val cpDir = new org.apache.hadoop.fs.Path(checkpoint)
    val fs = cpDir.getFileSystem(hconf)
    val wmFile = new org.apache.hadoop.fs.Path(cpDir, "delta_tail_version")
    val watermark: Option[Long] =
      if (!fs.exists(wmFile)) None
      else {
        val in = fs.open(wmFile)
        val raw = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
        val t = raw.trim
        // an unparseable watermark is OPERATOR-REPAIR territory, not a
        // silent restart-from-scratch (which would redeliver the whole
        // table into a sink that may not dedup the initial snapshot)
        require(t.nonEmpty && t.forall(_.isDigit),
          s"corrupt delta-tail watermark $wmFile (content: '$t') — repair or remove " +
            "the file; removing restarts the tail from a full initial snapshot")
        Some(t.toLong)
      }
    val snap = DeltaReader.snapshot(s, dir, None)
    val batch = watermark match {
      case None =>
        // initial load: the whole current snapshot as batch one
        Some(DeltaReader.read(s, dir, Some(snap.version)) -> snap.version)
      case Some(wm) if snap.version > wm =>
        val to = maxVersionsPerTrigger.map(m => math.min(snap.version, wm + m))
          .getOrElse(snap.version)
        Some(changes(s, dir, wm, to) -> to)
      case _ => None
    }
    batch.map { case (df, version) =>
      process(df, version)
      fs.mkdirs(cpDir)
      // write-then-rename: fs.create(wmFile, true) truncates in place,
      // so a crash mid-write would leave an empty/partial watermark and
      // wedge the stream instead of redelivering
      val tmp = new org.apache.hadoop.fs.Path(cpDir,
        s".delta_tail_version.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      if (fs.exists(wmFile)) fs.delete(wmFile, false)
      require(fs.rename(tmp, wmFile),
        s"rename $tmp -> $wmFile failed; the tail will redeliver version $version")
      version
    }
  }

  /** Drain every pending version: poll until quiescent. Returns the
    * number of batches delivered — the Trigger.AvailableNow shape for
    * tests and catch-up runs.
    */
  def drain(s: SparkSession, dir: String, checkpoint: String,
            process: (DataFrame, Long) => Unit,
            maxVersionsPerTrigger: Option[Int] = None): Int = {
    var n = 0
    while (pollOnce(s, dir, checkpoint, process, maxVersionsPerTrigger).isDefined) n += 1
    n
  }

  private def readWatermark(fs: org.apache.hadoop.fs.FileSystem,
                            wmFile: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(wmFile)) None
    else {
      val in = fs.open(wmFile)
      val raw = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
      val t = raw.trim
      require(t.nonEmpty && t.forall(_.isDigit),
        s"corrupt delta-tail watermark $wmFile (content: '$t') — repair or remove " +
          "the file; removing restarts the tail from its starting position")
      Some(t.toLong)
    }

  private def writeWatermark(fs: org.apache.hadoop.fs.FileSystem,
                             cpDir: org.apache.hadoop.fs.Path,
                             wmFile: org.apache.hadoop.fs.Path, version: Long): Unit = {
    fs.mkdirs(cpDir)
    val tmp = new org.apache.hadoop.fs.Path(cpDir,
      s".${wmFile.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(wmFile)) fs.delete(wmFile, false)
    require(fs.rename(tmp, wmFile),
      s"rename $tmp -> $wmFile failed; the tail will redeliver version $version")
  }

  /** One CHANGE-FEED micro-batch poll — the streaming form of
    * [[graft.sources.DeltaReader.readChanges]]: deliver the row-level
    * changes of every version committed since the watermark (schema =
    * table columns + `_change_type` + `_commit_version`), then advance
    * the watermark with the same atomic write-then-rename discipline
    * as [[pollOnce]]. Where the append-only tail REFUSES
    * delete/update/merge versions, this tail streams them — the CDC
    * consumer shape (sync a downstream store, invalidate caches,
    * retrain on deltas).
    *
    * `startingVersion`: Some(v) makes the first poll deliver changes
    * from version v (0 = the table's whole history as changes, the
    * initial inserts included); None starts tailing AFTER the current
    * version — the first poll just records the position and delivers
    * nothing, delta-spark's default for a new CDF stream.
    *
    * At-least-once per poll, exactly-once end-to-end with a
    * version-deduping sink — `_commit_version` rides IN the rows, so
    * the sink can dedup without extra plumbing. Underivable commits
    * (non-CDF rewrites) refuse loudly via readChanges; commits below
    * log retention refuse via the commit-not-present gate. Uses its
    * own watermark file, so a change tail and an append tail can share
    * a checkpoint directory without clobbering each other.
    */
  def pollChangesOnce(s: SparkSession, dir: String, checkpoint: String,
                      process: (DataFrame, Long) => Unit,
                      startingVersion: Option[Long] = None,
                      maxVersionsPerTrigger: Option[Int] = None): Option[Long] = {
    maxVersionsPerTrigger.foreach(m => require(m > 0,
      s"maxVersionsPerTrigger $m must be positive"))
    val hconf = s.sessionState.newHadoopConf()
    val cpDir = new org.apache.hadoop.fs.Path(checkpoint)
    val fs = cpDir.getFileSystem(hconf)
    val wmFile = new org.apache.hadoop.fs.Path(cpDir, "delta_tail_cdf_version")
    val watermark = readWatermark(fs, wmFile)
    val snap = graft.sources.DeltaReader.snapshot(s, dir, None)
    val from: Long = watermark.map(_ + 1).orElse(startingVersion).getOrElse {
      // start-from-now: record the position, deliver nothing
      writeWatermark(fs, cpDir, wmFile, snap.version)
      return None
    }
    if (from > snap.version) return None
    val to = maxVersionsPerTrigger.map(m => math.min(snap.version, from + m - 1))
      .getOrElse(snap.version)
    // the SPLIT form: this poller's consumer takes the logical CDF
    // shape, so a window crossing a column-mapping removal delivers
    // per-version instead of wedging the watermark behind the batch
    // refusal forever (the poller cannot split its own window)
    val batch = DeltaReader.readChangesSplit(s, dir, from, to)
    process(batch, to)
    writeWatermark(fs, cpDir, wmFile, to)
    Some(to)
  }

  /** Drain the change feed until quiescent; returns batches delivered. */
  def drainChanges(s: SparkSession, dir: String, checkpoint: String,
                   process: (DataFrame, Long) => Unit,
                   startingVersion: Option[Long] = None,
                   maxVersionsPerTrigger: Option[Int] = None): Int = {
    var n = 0
    while (pollChangesOnce(s, dir, checkpoint, process, startingVersion,
      maxVersionsPerTrigger).isDefined) n += 1
    n
  }
}
