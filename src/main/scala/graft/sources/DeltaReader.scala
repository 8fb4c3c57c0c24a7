package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal read path for the Delta Lake table format, implemented
  * against the PUBLIC protocol spec (delta-io/delta PROTOCOL.md)
  * because the delta-spark connector is not on the classpath: a Delta
  * table is parquet data files plus an ordered `_delta_log` of JSON
  * commits (optionally compacted into parquet checkpoints), and a
  * snapshot is the add-file set left after replaying the log.
  *
  * Supported: JSON commits, classic single-file AND multi-part
  * checkpoints (both discovered by listing — `_last_checkpoint` is an
  * optimization hint, not required for correctness), partition
  * columns (types parsed from `metaData.schemaString`, a Spark
  * StructType JSON), and time travel via `versionAsOf`. Refused
  * LOUDLY rather than misread: `protocol.minReaderVersion > 1`
  * (column mapping / deletion vectors change how data must be
  * interpreted), a log whose retention cleaned commits below the
  * replay base (a silent partial snapshot otherwise), and absolute
  * `add.path` URIs (shallow clones / external files).
  *
  * All log access rides the Hadoop FileSystem API resolved from the
  * table path's scheme — a `java.io.File` walk would silently see no
  * `_delta_log` on hdfs:// or s3a:// and fall through to a raw
  * parquet read of staged files.
  *
  * Scale: the log is driver-parsed, which is the design of the format
  * itself (logs are KB-MB; Delta compacts them into checkpoints so
  * readers never replay unbounded JSON); the DATA read stays a fully
  * distributed parquet scan with pushdown and pruning, one union
  * branch per partition-value tuple (reference: the lake formats named
  * in the build brief; no reference-repo counterpart — MaCO reads raw
  * csv/parquet only).
  */
object DeltaReader {

  /** `size`/`modificationTime` ride through the snapshot so the
    * checkpoint writer can emit them — the protocol REQUIRES them in
    * checkpoint `add` actions, and dropping them would break real
    * delta-spark readers of graft-written checkpoints.
    */
  private[graft] case class AddFile(path: String, partitionValues: Map[String, String],
                                      size: Long = 0L, modificationTime: Long = 0L)

  /** The replayed log state at one version — what both the reader and
    * the checkpoint writer need: the live add set plus table metadata
    * (`configuration` carries `delta.columnMapping.mode`; a checkpoint
    * must re-emit it or a remounted reader loses the mapping).
    * `minWriter` and the feature lists ride along for the same reason:
    * a checkpoint that re-stated the protocol as (1,2) would DOWNGRADE
    * a column-mapping table's declared requirements, and a real reader
    * replaying from that checkpoint would misinterpret the data it
    * gates.
    */
  private[graft] case class Snapshot(version: Long, active: Seq[AddFile],
                                       schemaJson: String, partCols: Seq[String],
                                       minReader: Long,
                                       configuration: Map[String, String] = Map.empty,
                                       minWriter: Long = 2L,
                                       readerFeatures: Seq[String] = Nil,
                                       writerFeatures: Seq[String] = Nil,
                                       txns: Map[String, Long] = Map.empty,
                                       metaId: Option[String] = None)

  /** RFC 2396 percent-decoding of `add.path` — NOT URLDecoder, whose
    * application/x-www-form-urlencoded rules turn a literal '+' in a
    * file name into a space and resolve the wrong file.
    */
  private[graft] def percentDecode(p: String): String = {
    val out = new java.io.ByteArrayOutputStream(p.length)
    var i = 0
    var lit = 0 // start of the current run of literal chars
    def flush(until: Int): Unit =
      // whole-substring encoding keeps surrogate PAIRS together — a
      // char-at-a-time encode would turn each half of a non-BMP
      // character into a '?' byte
      if (until > lit) out.write(p.substring(lit, until).getBytes("UTF-8"))
    while (i < p.length) {
      if (p.charAt(i) == '%') {
        flush(i)
        require(i + 2 < p.length, s"truncated percent escape at offset $i in add.path '$p'")
        val hex = p.substring(i + 1, i + 3)
        require(hex.forall(c => Character.digit(c, 16) >= 0),
          s"malformed percent escape '%$hex' at offset $i in add.path '$p'")
        out.write(Integer.parseInt(hex, 16))
        i += 3
        lit = i
      } else i += 1
    }
    flush(p.length)
    new String(out.toByteArray, "UTF-8")
  }

  /** True when `dir` is a Delta table root (any Hadoop scheme). */
  def isDeltaTable(dir: String, conf: Configuration): Boolean = {
    val log = new Path(dir, "_delta_log")
    val fs = log.getFileSystem(conf)
    try fs.getFileStatus(log).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

  /** Convenience overload for local callers with no Hadoop conf in
    * hand; a default Configuration resolves file:// and whatever the
    * cluster's core-site declares.
    */
  def isDeltaTable(dir: String): Boolean = isDeltaTable(dir, new Configuration())

  /** True when `_delta_log` holds at least one commit or checkpoint —
    * distinguishes a live table from the EMPTY log directory a writer
    * crash between mkdirs and its version-0 commit leaves behind
    * (snapshot() on that state throws; a creating writer must treat
    * it as absent and re-create, or the table is stuck forever).
    */
  def hasLogEntries(dir: String, conf: Configuration): Boolean = {
    val log = new Path(dir, "_delta_log")
    val fs = log.getFileSystem(conf)
    try fs.listStatus(log).exists { st =>
      val n = st.getPath.getName
      n.matches("\\d{20}\\.json") ||
        n.matches("\\d{20}\\.checkpoint(\\.\\d{10}\\.\\d{10})?\\.parquet")
    } catch { case _: java.io.FileNotFoundException => false }
  }

  /** Replay the log to the target version. Driver-side by design (see
    * scaladoc above); every FS touch goes through `fs`.
    */
  private[graft] def snapshot(s: SparkSession, dir: String,
                                versionAsOf: Option[Long]): Snapshot = {
    val hconf = s.sessionState.newHadoopConf()
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(hconf)
    require(
      try fs.getFileStatus(logPath).isDirectory
      catch { case _: java.io.FileNotFoundException => false },
      s"not a Delta table (no _delta_log): $dir")
    val entries = fs.listStatus(logPath).toSeq
    val commits = entries
      .filter(st => st.isFile && st.getPath.getName.matches("\\d{20}\\.json"))
      .map(st => st.getPath.getName.take(20).toLong -> st.getPath)
      .sortBy(_._1)
    // classic single-file checkpoints AND multi-part
    // NNN.checkpoint.PPPPPPPPPP.QQQQQQQQQQ.parquet — a version's parts
    // are read together as one snapshot base; ignoring the multi-part
    // form would silently drop every file added at or before it when
    // retention has cleaned the pre-checkpoint commits
    val checkpoints: Seq[(Long, Seq[Path])] = entries
      .filter(st => st.isFile &&
        st.getPath.getName.matches("\\d{20}\\.checkpoint(\\.\\d{10}\\.\\d{10})?\\.parquet"))
      .map(_.getPath)
      .groupBy(_.getName.take(20).toLong)
      .map { case (v, ps) => v -> ps.sortBy(_.getName) }
      .toSeq.sortBy(_._1)
    val target = versionAsOf.getOrElse(
      (commits.map(_._1) ++ checkpoints.map(_._1)).maxOption.getOrElse(
        sys.error(s"empty _delta_log: $dir")))
    versionAsOf.foreach { v =>
      require(commits.exists(_._1 == v) || checkpoints.exists(_._1 == v),
        s"versionAsOf $v not present in $logPath")
    }

    val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Nil
    var minReader = 1L
    var minWriter = 1L
    var readerFeatures: Set[String] = Set.empty
    var writerFeatures: Set[String] = Set.empty
    var configuration: Map[String, String] = Map.empty
    var txns: Map[String, Long] = Map.empty
    var metaId: Option[String] = None

    // base: the newest checkpoint at or below the target version —
    // exactly how a real Delta reader avoids replaying the full log
    val base = checkpoints.filter(_._1 <= target).lastOption
    base.foreach { case (v, psAll) =>
      // both checkpoint forms may coexist at one version; a classic
      // single file is complete by itself, so prefer it — mixing the
      // forms in one read would double-count adds and fail the
      // multi-part completeness check on an intact table
      val classic = psAll.filter(_.getName.matches("\\d{20}\\.checkpoint\\.parquet"))
      val ps = if (classic.nonEmpty) classic else psAll
      // a multi-part checkpoint names its part count — all parts must
      // be present or the snapshot base is silently partial
      val multi = "\\d{20}\\.checkpoint\\.\\d{10}\\.(\\d{10})\\.parquet".r
      ps.head.getName match {
        case multi(total) =>
          require(ps.size == total.toInt,
            s"checkpoint $v has ${ps.size} of $total parts in $logPath — refusing a partial snapshot")
        case _ =>
      }
      val cp = s.read.parquet(ps.map(_.toString): _*)
      val cols = cp.columns.toSet
      val rows = cp.collect()
      rows.foreach { r =>
        if (cols("add") && !r.isNullAt(r.fieldIndex("add"))) {
          val a = r.getStruct(r.fieldIndex("add"))
          val aFields = a.schema.fieldNames.toSet
          def optLong(name: String): Long =
            if (aFields(name) && !a.isNullAt(a.fieldIndex(name)))
              a.getAs[Number](name).longValue() else 0L
          val pv = Option(a.getMap[String, String](a.fieldIndex("partitionValues")))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          val p = a.getString(a.fieldIndex("path"))
          active(p) = AddFile(p, pv, optLong("size"), optLong("modificationTime"))
        }
        if (cols("metaData") && !r.isNullAt(r.fieldIndex("metaData"))) {
          val md = r.getStruct(r.fieldIndex("metaData"))
          val mdFields = md.schema.fieldNames.toSet
          schemaJson = Some(md.getString(md.fieldIndex("schemaString")))
          partCols = md.getSeq[String](md.fieldIndex("partitionColumns"))
          if (mdFields("configuration") && !md.isNullAt(md.fieldIndex("configuration")))
            configuration = md.getMap[String, String](md.fieldIndex("configuration")).toMap
          if (mdFields("id") && !md.isNullAt(md.fieldIndex("id")))
            metaId = Some(md.getString(md.fieldIndex("id")))
        }
        if (cols("protocol") && !r.isNullAt(r.fieldIndex("protocol"))) {
          val pr = r.getStruct(r.fieldIndex("protocol"))
          // real delta-spark checkpoints store protocol versions as
          // int32 (the protocol's parquet schema); hand-built fixtures
          // may say int64 — getLong on an Integer throws, so go
          // through Number
          minReader = math.max(minReader,
            pr.getAs[Number]("minReaderVersion").longValue())
          minWriter = math.max(minWriter,
            pr.getAs[Number]("minWriterVersion").longValue())
          val prFields = pr.schema.fieldNames.toSet
          if (prFields("readerFeatures") && !pr.isNullAt(pr.fieldIndex("readerFeatures")))
            readerFeatures = pr.getSeq[String](pr.fieldIndex("readerFeatures")).toSet
          if (prFields("writerFeatures") && !pr.isNullAt(pr.fieldIndex("writerFeatures")))
            writerFeatures = pr.getSeq[String](pr.fieldIndex("writerFeatures")).toSet
        }
        if (cols("txn") && !r.isNullAt(r.fieldIndex("txn"))) {
          val tx = r.getStruct(r.fieldIndex("txn"))
          txns += tx.getString(tx.fieldIndex("appId")) ->
            tx.getAs[Number]("version").longValue()
        }
      }
    }

    // replay JSON commits (base, target] in version order; action order
    // inside a commit is preserved by per-line parsing. The chain must
    // be CONTIGUOUS from the base: a gap means log retention cleaned
    // commits this replay needs — a silent partial snapshot otherwise
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val replay = commits.filter { case (v, _) => v > base.map(_._1).getOrElse(-1L) && v <= target }
    val expected = (base.map(_._1).getOrElse(-1L) + 1) to target
    require(replay.map(_._1) == expected,
      s"commit chain ${replay.map(_._1)} does not cover $expected in $logPath " +
        "(log cleaned past the newest usable checkpoint?) — refusing a partial snapshot")
    replay
      .foreach { case (_, p) =>
        val in = fs.open(p)
        val rd = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        try Iterator.continually(rd.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty).foreach { line =>
          val n = om.readTree(line)
          if (n.has("add")) {
            val a = n.get("add")
            require(!a.has("deletionVector") || a.get("deletionVector").isNull,
              s"add action carries a deletion vector in $logPath — refusing to " +
                "surface deleted rows as live data")
            val pv = Option(a.get("partitionValues")).map { m =>
              val it = m.fields()
              val b = Map.newBuilder[String, String]
              while (it.hasNext) { val e = it.next(); b += e.getKey ->
                (if (e.getValue.isNull) null else e.getValue.asText()) }
              b.result()
            }.getOrElse(Map.empty[String, String])
            val pth = a.get("path").asText()
            def optLong(name: String): Long =
              if (a.has(name) && !a.get(name).isNull) a.get(name).asLong() else 0L
            active(pth) = AddFile(pth, pv, optLong("size"), optLong("modificationTime"))
          }
          if (n.has("remove")) active.remove(n.get("remove").get("path").asText())
          if (n.has("metaData")) {
            val md = n.get("metaData")
            schemaJson = Some(md.get("schemaString").asText())
            metaId = Option(md.get("id")).filterNot(_.isNull).map(_.asText())
            partCols = Option(md.get("partitionColumns")).map { pcs =>
              (0 until pcs.size()).map(pcs.get(_).asText())
            }.getOrElse(Nil)
            configuration = Option(md.get("configuration")).filterNot(_.isNull).map { c =>
              val it = c.fields()
              val b = Map.newBuilder[String, String]
              while (it.hasNext) { val e = it.next(); b += e.getKey ->
                (if (e.getValue.isNull) null else e.getValue.asText()) }
              b.result()
            }.getOrElse(Map.empty)
          }
          if (n.has("protocol")) {
            val pr = n.get("protocol")
            minReader = math.max(minReader, pr.get("minReaderVersion").asLong())
            minWriter = math.max(minWriter, pr.get("minWriterVersion").asLong())
            readerFeatures = Option(pr.get("readerFeatures")).filterNot(_.isNull).map { fs0 =>
              (0 until fs0.size()).map(fs0.get(_).asText()).toSet
            }.getOrElse(readerFeatures)
            writerFeatures = Option(pr.get("writerFeatures")).filterNot(_.isNull).map { fs0 =>
              (0 until fs0.size()).map(fs0.get(_).asText()).toSet
            }.getOrElse(writerFeatures)
          }
          if (n.has("txn")) {
            val tx = n.get("txn")
            // later commits override: the latest version per appId is
            // the idempotence watermark a streaming writer consults
            txns += tx.get("appId").asText() -> tx.get("version").asLong()
          }
        } finally rd.close()
      }

    // Reader-version gate, per PROTOCOL.md: version 2 adds column
    // mapping (supported below, name mode only); version 3 tables list
    // their reader features explicitly — anything beyond column mapping
    // (deletion vectors, v2 checkpoints, …) changes how data must be
    // interpreted and is refused LOUDLY rather than misread.
    if (minReader >= 3) {
      require(minReader == 3,
        s"Delta protocol minReaderVersion $minReader not supported — refusing to misread the table")
      require(readerFeatures.nonEmpty,
        s"Delta protocol minReaderVersion 3 with no readerFeatures in $logPath — " +
          "malformed table, refusing to guess its reader requirements")
      val unsupported = readerFeatures -- Set("columnMapping")
      require(unsupported.isEmpty,
        s"unsupported Delta reader features ${unsupported.mkString(", ")} " +
          "(only columnMapping is implemented) — refusing to misread the table")
    }
    val cmMode = configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name",
      s"delta.columnMapping.mode '$cmMode' not supported (none/name only; id mode " +
        "needs parquet field-id resolution) — refusing to misread the table")
    Snapshot(target, active.values.toSeq,
      schemaJson.getOrElse(sys.error(s"no metaData action found in $logPath")),
      partCols, minReader, configuration,
      minWriter, readerFeatures.toSeq.sorted, writerFeatures.toSeq.sorted, txns, metaId)
  }

  /** Snapshot read at the latest version, or at `versionAsOf`.
    *
    * Column mapping (name mode): the parquet files carry PHYSICAL
    * column names (`delta.columnMapping.physicalName` in the
    * schemaString field metadata) and `partitionValues` keys are
    * physical too — the scan reads physical names and the projection
    * renames to the logical schema. Metadata-only remap: same
    * distributed scan, pushdown and pruning as the unmapped path.
    */
  /** Highest `txn` version committed for `appId`, or -1 if none — the
    * idempotence watermark of PROTOCOL.md's transaction identifiers: a
    * streaming writer skips any batch id at or below it, so a batch
    * retried after a sink crash lands exactly once.
    */
  def lastTxnVersion(s: SparkSession, dir: String, appId: String): Long =
    snapshot(s, dir, None).txns.getOrElse(appId, -1L)

  def read(s: SparkSession, dir: String, versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(s, dir, versionAsOf)
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val mapped = snap.configuration.getOrElse("delta.columnMapping.mode", "none") == "name"
    def physName(f: org.apache.spark.sql.types.StructField): String =
      if (!mapped) f.name
      else {
        require(f.metadata.contains("delta.columnMapping.physicalName"),
          s"column mapping is 'name' but field '${f.name}' carries no " +
            "delta.columnMapping.physicalName metadata — malformed schemaString")
        f.metadata.getString("delta.columnMapping.physicalName")
      }
    val dataSchema = StructType(schema.fields.filterNot(f => snap.partCols.contains(f.name))
      .map(f => f.copy(name = physName(f))))
    val logicalByPhys = schema.fields.filterNot(f => snap.partCols.contains(f.name))
      .map(f => physName(f) -> f.name)
    val partSchema = schema.fields.filter(f => snap.partCols.contains(f.name))

    if (snap.active.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    // one union branch per partition-value tuple: partition values come
    // from the LOG (authoritative per the spec), typed via schemaString
    val groups = snap.active.groupBy(_.partitionValues)
    groups.map { case (pv, files) =>
      val paths = files.map { f =>
        require(!f.path.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*"),
          s"absolute add.path URI ${f.path} (shallow clone / external file) not supported — " +
            "refusing to misresolve it against the table root")
        new Path(dir, percentDecode(f.path)).toString
      }
      val base0 = s.read.schema(dataSchema).parquet(paths: _*)
      val base = logicalByPhys.foldLeft(base0) { case (df, (phys, logical)) =>
        if (phys == logical) df else df.withColumnRenamed(phys, logical)
      }
      val withParts = partSchema.foldLeft(base) { (df, f) =>
        // physical key first (what a column-mapped log writes), logical
        // as the compatibility fallback
        val raw = pv.get(physName(f)).orElse(pv.get(f.name)).orNull
        df.withColumn(f.name, lit(raw).cast(f.dataType))
      }
      withParts.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }.reduce(_ unionByName _)
  }
}
