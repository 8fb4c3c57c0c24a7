package graft.streaming

import graft.sources.DeltaReader
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Incremental materialized-view maintenance over a Delta change feed.
  *
  * Maintains a SUM/COUNT-per-key aggregate of a CDF-enabled Delta table
  * WITHOUT rescanning it: each refresh reads only the row-level changes
  * since the last maintained version (`DeltaReader.readChanges`),
  * folds them into signed per-key deltas (insert/update_postimage = +,
  * delete/update_preimage = −), and merges that delta table into the
  * persisted view state — cost ∝ CHANGED rows, not table size, which
  * is the whole point at 100 TB: a daily DELETE touching 0.1% of the
  * lake refreshes the view in 0.1% of a rescan. SUM and COUNT are the
  * self-maintainable aggregates (AVG = SUM/COUNT at read; MIN/MAX are
  * NOT maintainable under deletes without per-key history — refuse to
  * pretend otherwise).
  *
  * Exactly-once discipline (the DeltaTail watermark pattern): state
  * for version v lands under `state_v<v>/` via an idempotent
  * overwrite, THEN the
  * watermark file advances by write-to-temp + atomic rename. A crash
  * between the two replays the same change window into the same
  * directory — same bytes, no double counting. Money sums stay in
  * decimal (exact, associative) so replays and shuffle orders cannot
  * drift the state.
  */
object ViewMaintain {

  private val WmName = "ivm_version"

  /** One maintenance step: fold every change version since the last
    * maintained one into the view at `stateDir`. First call aggregates
    * the CURRENT snapshot once (the unavoidable initial scan) and
    * records its version. Returns the maintained version, or None if
    * already current. `value` must be a deterministic expression over
    * the source columns; it is cast to decimal(18,2) and summed exactly.
    */
  def maintainOnce(s: SparkSession, srcDir: String, stateDir: String,
                   keys: Seq[String], value: Column): Option[Long] = {
    require(keys.nonEmpty, "ivm: need at least one key column")
    val hconf = s.sessionState.newHadoopConf()
    val stateRoot = new Path(stateDir)
    val fs = stateRoot.getFileSystem(hconf)
    val wmFile = new Path(stateRoot, WmName)
    val wm = readWatermark(fs, wmFile)
    val snap = DeltaReader.snapshot(s, srcDir, None)
    val v = snap.version
    val dec = "decimal(28,2)"

    wm match {
      case Some(w) if w >= v => None
      case None =>
        // initial materialization: one full aggregate of the snapshot,
        // PINNED to the version recorded as the watermark — a commit
        // landing between snapshot() and plan execution must not leak
        // into state labeled v (it would be double-applied by the next
        // incremental refresh of versions (v, v'])
        val full = DeltaReader.read(s, srcDir, versionAsOf = Some(v))
          .groupBy(keys.map(col): _*)
          .agg(sum(value.cast("decimal(18,2)")).cast(dec).as("view_sum"),
            count(lit(1)).as("view_cnt"))
        writeState(s, fs, stateRoot, wmFile, full, v)
        Some(v)
      case Some(w) =>
        // the SPLIT form: the view consumes only the logical CDF shape
        // (keys + value + _change_type), which is transition-invariant
        // — a catch-up window crossing a column-mapping removal must
        // maintain the view, not strand it behind the batch refusal
        val changes = DeltaReader.readChangesSplit(s, srcDir, w + 1, v)
        val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1))
          .when(col("_change_type").isin("delete", "update_preimage"), lit(-1))
        val delta = changes
          .select((keys.map(col) :+ (sign * value.cast("decimal(18,2)")).as("__dv") :+
            sign.cast("long").as("__dc")): _*)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("__dv")).cast(dec).as("d_sum"), sum(col("__dc")).as("d_cnt"))
        val old = readView(s, stateDir)
        val merged = old.join(delta, keys, "full_outer")
          .select((keys.map(col) :+
            (coalesce(col("view_sum"), lit(0).cast(dec)) +
              coalesce(col("d_sum"), lit(0).cast(dec))).cast(dec).as("view_sum") :+
            (coalesce(col("view_cnt"), lit(0L)) +
              coalesce(col("d_cnt"), lit(0L))).as("view_cnt")): _*)
          .where(col("view_cnt") =!= 0L)
        writeState(s, fs, stateRoot, wmFile, merged, v)
        Some(v)
    }
  }

  /** Refresh until current; returns the number of steps applied. */
  def maintain(s: SparkSession, srcDir: String, stateDir: String,
               keys: Seq[String], value: Column): Int = {
    var n = 0
    while (maintainOnce(s, srcDir, stateDir, keys, value).isDefined) n += 1
    n
  }

  /** The maintained view: (keys..., view_sum, view_cnt) at the
    * watermarked version.
    */
  def readView(s: SparkSession, stateDir: String): DataFrame = {
    val stateRoot = new Path(stateDir)
    val fs = stateRoot.getFileSystem(s.sessionState.newHadoopConf())
    val wm = readWatermark(fs, new Path(stateRoot, WmName)).getOrElse(
      throw new IllegalStateException(s"ivm: no maintained view at $stateDir"))
    s.read.parquet(new Path(stateRoot, s"state_v$wm").toString)
  }

  /** The version the view reflects (None before the first refresh). */
  def maintainedVersion(s: SparkSession, stateDir: String): Option[Long] = {
    val stateRoot = new Path(stateDir)
    val fs = stateRoot.getFileSystem(s.sessionState.newHadoopConf())
    readWatermark(fs, new Path(stateRoot, WmName))
  }

  private def writeState(s: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                         stateRoot: Path, wmFile: Path, view: DataFrame,
                         v: Long): Unit = {
    view.write.mode("overwrite")
      .parquet(new Path(stateRoot, s"state_v$v").toString)
    val tmp = new Path(stateRoot, s".$WmName.tmp")
    val out = fs.create(tmp, true)
    out.write(v.toString.getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, wmFile)) {
      fs.delete(wmFile, false)
      require(fs.rename(tmp, wmFile), s"ivm: cannot advance watermark $wmFile")
    }
    // garbage-collect superseded states only AFTER the watermark points
    // at the new one: a crash anywhere in writeState then leaves, at
    // worst, an extra stale state dir (cleaned by the next successful
    // writeState) — never a watermark referencing a deleted directory
    val keep = s"state_v$v"
    if (fs.exists(stateRoot)) fs.listStatus(stateRoot).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("state_v") && n != keep) fs.delete(st.getPath, true)
    }
  }

  /** The maintained watermark. When the file is ABSENT but completed
    * state dirs exist (crash inside the delete-then-rename fallback of
    * writeState), recover from the newest state_v* dir that finished
    * its parquet commit (`_SUCCESS` present — a torn state write never
    * has one) and rewrite the file, instead of transiently refusing
    * reads and forcing a full re-materialization.
    */
  private def readWatermark(fs: org.apache.hadoop.fs.FileSystem,
                            wmFile: Path): Option[Long] =
    if (!fs.exists(wmFile)) {
      val stateRoot = wmFile.getParent
      val recovered =
        if (!fs.exists(stateRoot)) None
        else fs.listStatus(stateRoot).iterator.map(_.getPath)
          .filter(p => p.getName.startsWith("state_v") &&
            p.getName.stripPrefix("state_v").forall(_.isDigit) &&
            fs.exists(new Path(p, "_SUCCESS")))
          .map(_.getName.stripPrefix("state_v").toLong)
          .foldLeft(Option.empty[Long])((m, x) => Some(m.fold(x)(math.max(_, x))))
      recovered.foreach { v =>
        val tmp = new Path(stateRoot, s".$WmName.tmp")
        val out = fs.create(tmp, true)
        out.write(v.toString.getBytes("UTF-8"))
        out.close()
        require(fs.rename(tmp, wmFile), s"ivm: cannot recover watermark $wmFile")
      }
      recovered
    } else {
      val in = fs.open(wmFile)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val t = raw.trim
      require(t.nonEmpty && t.forall(_.isDigit),
        s"ivm: unparseable watermark at $wmFile: '$raw' — repair or remove the file")
      Some(t.toLong)
    }
}
