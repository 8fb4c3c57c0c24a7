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
  * StructType JSON), time travel via `versionAsOf`, column mapping
  * (name mode), and deletion vectors (inline and sidecar: the
  * roaring-bitmap row indexes anti-filter the scan through
  * `_metadata.row_index`), and absolute `add.path` URIs (what shallow
  * clones and external files write — resolved as the URI they are
  * rather than against the table root). Refused LOUDLY rather than
  * misread: reader features beyond columnMapping/deletionVectors, and
  * a log whose retention cleaned commits below the replay base (a
  * silent partial snapshot otherwise).
  *
  * All log access rides the Hadoop FileSystem API resolved from the
  * table path's scheme — a `java.io.File` walk would silently see no
  * `_delta_log` on hdfs:// or s3a:// and fall through to a raw
  * parquet read of staged files.
  *
  * Scale: JSON commits are driver-parsed, which is the design of the
  * format itself (the commit suffix past a checkpoint is bounded by
  * checkpointInterval); the CHECKPOINT — O(live files), millions of
  * entries on a 100-TB table — is never collected wholesale: its add
  * entries stay a distributed DataFrame, the live set resolves via a
  * broadcast anti-join against the (small) suffix, and only the final
  * file list the scan needs reaches the driver, lazily and gated by
  * `spark.graft.delta.maxSnapshotFiles`. The DATA read stays a fully
  * distributed parquet scan with pushdown and pruning, one union
  * branch per partition-value tuple (reference: the lake formats named
  * in the build brief; no reference-repo counterpart — MaCO reads raw
  * csv/parquet only).
  */
object DeltaReader {

  /** PROTOCOL.md `add.deletionVector` descriptor: which rows of the
    * data file are deleted, stored as a serialized roaring bitmap
    * either inline (`storageType` "i", base85 bytes in
    * `pathOrInlineDv`) or in a sidecar `.bin` file ("u": base85 UUID
    * suffix naming `deletion_vector_<uuid>.bin` under an optional
    * random prefix; "p": absolute path). `offset` locates the DV
    * inside a shared sidecar (one file may hold many DVs).
    */
  private[graft] case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                                         offset: Option[Int], sizeInBytes: Int,
                                         cardinality: Long)

  /** `size`/`modificationTime` ride through the snapshot so the
    * checkpoint writer can emit them — the protocol REQUIRES them in
    * checkpoint `add` actions, and dropping them would break real
    * delta-spark readers of graft-written checkpoints.
    */
  private[graft] case class AddFile(path: String, partitionValues: Map[String, String],
                                      size: Long = 0L, modificationTime: Long = 0L,
                                      dv: Option[DvDescriptor] = None,
                                      stats: Option[String] = None,
                                      baseRowId: Option[Long] = None,
                                      defaultRowCommitVersion: Option[Long] = None,
                                      clusteringProvider: Option[String] = None)

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
  private[graft] final class Snapshot(val version: Long,
                                      resolve: Option[Map[String, String]] => Seq[AddFile],
                                      val schemaJson: String, val partCols: Seq[String],
                                      val minReader: Long,
                                      val configuration: Map[String, String],
                                      val minWriter: Long,
                                      val readerFeatures: Seq[String],
                                      val writerFeatures: Seq[String],
                                      val txns: Map[String, Long],
                                      val metaId: Option[String],
                                      val domainMetadata: Map[String, String] = Map.empty,
                                      cpAdds: Option[DataFrame] = None,
                                      suffixFinal: Seq[(String, Option[AddFile])] = Nil,
                                      val metaRaw: Option[String] = None) {

    /** The live add set as a DISTRIBUTED DataFrame in the 10-column
      * resolve shape — never collected: the checkpoint's adds stay a
      * scan, the (small) commit suffix anti-joins them away and its
      * own survivors union in. The checkpoint WRITER consumes this, so
      * authoring a checkpoint of a multi-million-file table costs no
      * driver memory at all (the read side's gated `active` is for
      * scan planning, which needs the list on the driver anyway).
      */
    def activeDf(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.functions.broadcast
      import s.implicits._
      val survivors = suffixFinal.collect { case (_, Some(af)) => af }
      val sfxDf = if (survivors.isEmpty) None else Some(addsAsResolveDf(s, survivors))
      val cpLive = cpAdds.map { adds =>
        if (suffixFinal.isEmpty) adds
        else adds.join(broadcast(suffixFinal.map(_._1).toDF("path")), Seq("path"), "left_anti")
      }
      (cpLive, sfxDf) match {
        case (Some(a), Some(b)) => a.unionByName(b)
        case (a, b) => a.orElse(b).getOrElse(addsAsResolveDf(s, Nil))
      }
    }
    /** The resolved live add set. LAZY: forcing it runs the distributed
      * last-writer-wins resolution over the checkpoint and collects the
      * final file list (gated by `spark.graft.delta.maxSnapshotFiles`)
      * to the driver — scalar-only consumers (txn watermarks, append
      * gates, version discovery) never pay a per-file cost at all.
      */
    lazy val active: Seq[AddFile] = resolve(None)

    /** The live adds whose log `partitionValues` carry EVERY (key,
      * value) in `partition` — partition pruning applied INSIDE the
      * distributed resolution, before the gated collect: the driver
      * never materializes the other partitions' entries, and the
      * maxSnapshotFiles gate applies to the PRUNED list (a partition
      * read can succeed on a table whose full listing would refuse).
      * Keys/values are the log's string form (physical keys on a
      * column-mapped table); null partition values don't match.
      */
    def activeMatching(partition: Map[String, String]): Seq[AddFile] =
      if (partition.isEmpty) active else resolve(Some(partition))

    /** Memo for the plain full-table scan DataFrame ([[DeltaReader.read]]):
      * a Snapshot is immutable and (via the cache) shared across a
      * session's queries, so the scan plan — whose construction pays a
      * per-file-listing InMemoryFileIndex setup — is built once per
      * (table, version), not once per query. DataFrame plans are
      * immutable; reuse across queries is exactly what a cached
      * DataFrame already does.
      */
    private[graft] var fullScanMemo: Option[DataFrame] = None
  }

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

  /** An `add.path` that is a full URI rather than a table-root-relative
    * path — what shallow clones and external files write (PROTOCOL.md:
    * "a relative path ... or an absolute path"). Any scheme-colon
    * prefix counts (delta-spark resolves through java.net.URI, where
    * single-slash `file:/tmp/x` is as absolute as `file:///tmp/x`);
    * graft's own relative entries percent-encode ':' so they can never
    * false-positive here.
    */
  private[graft] def isAbsoluteAddPath(p: String): Boolean =
    p.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")

  /** Resolve an `add.path` to a concrete filesystem path: relative
    * entries percent-decode and resolve against the table root;
    * absolute entries parse as the URI they are (java.net.URI performs
    * the percent-decoding, so both forms decode identically — a space
    * stored as %20 round-trips either way).
    */
  private[graft] def resolveAddPath(root: Path, p: String): Path =
    if (isAbsoluteAddPath(p)) new Path(new java.net.URI(p))
    else new Path(root, percentDecode(p))

  /** Z85 base85 (ZeroMQ spec 32) — the alphabet real Delta writers
    * (delta-spark Base85Codec, delta-rs) use for deletion-vector UUIDs
    * and inline bitmaps; PROTOCOL.md's own example pathOrInlineDv
    * (`ab^-aqEH.-t@S}K{vb[*k^` → d2c639aa-8816-431a-aaf6-d3fe2512ff61)
    * contains '.' and '[', which RFC 1924's charset lacks. 5 chars
    * decode to 4 bytes, most-significant digit first.
    */
  private val Base85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Base85Rev: Array[Int] = {
    val t = Array.fill(128)(-1)
    Base85Alphabet.zipWithIndex.foreach { case (c, i) => t(c) = i }
    t
  }

  private[graft] def base85Decode(enc: String): Array[Byte] = {
    require(enc.length % 5 == 0,
      s"base85 input length ${enc.length} is not a multiple of 5: '$enc'")
    val out = new Array[Byte](enc.length / 5 * 4)
    var i = 0; var o = 0
    while (i < enc.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = enc.charAt(i + j)
        val v = if (c < 128) Base85Rev(c) else -1
        require(v >= 0, s"invalid base85 character '$c' in '$enc'")
        acc = acc * 85 + v
        j += 1
      }
      require(acc <= 0xFFFFFFFFL, s"base85 group overflows 32 bits in '$enc'")
      out(o) = ((acc >>> 24) & 0xff).toByte; out(o + 1) = ((acc >>> 16) & 0xff).toByte
      out(o + 2) = ((acc >>> 8) & 0xff).toByte; out(o + 3) = (acc & 0xff).toByte
      i += 5; o += 4
    }
    out
  }

  private[graft] def base85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"base85 input length ${bytes.length} not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      val grp = new Array[Char](5)
      var j = 4
      while (j >= 0) { grp(j) = Base85Alphabet(((acc % 85)).toInt); acc /= 85; j -= 1 }
      sb.appendAll(grp)
      i += 4
    }
    sb.result()
  }

  /** Sidecar path for a "u"/"p" deletion vector: the last 20 chars of
    * `pathOrInlineDv` are the base85 UUID, anything before them is the
    * random directory prefix the writer scattered files under.
    */
  private[graft] def dvFilePath(tableDir: Path, d: DvDescriptor): Path = d.storageType match {
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"deletionVector pathOrInlineDv '${d.pathOrInlineDv}' shorter than a base85 UUID")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val bb = java.nio.ByteBuffer.wrap(base85Decode(d.pathOrInlineDv.takeRight(20)))
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tableDir, name)
      else new Path(new Path(tableDir, prefix), name)
    case "p" => new Path(d.pathOrInlineDv)
    case other => sys.error(s"deletionVector storageType '$other' has no file path")
  }

  /** Decode a serialized RoaringBitmapArray (PROTOCOL.md's portable
    * form: magic 1681511377 as little-endian int32, little-endian
    * int64 bitmap count, then per bitmap a little-endian int32 high
    * key + a standard portable 32-bit roaring bitmap) into sorted row
    * indexes.
    */
  private[graft] def decodeDvBitmap(bytes: Array[Byte], cardinality: Long): Array[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = Integer.reverseBytes(in.readInt())
    require(magic == 1681511377,
      s"deletion vector magic $magic != 1681511377 — not a portable RoaringBitmapArray")
    val n = java.lang.Long.reverseBytes(in.readLong())
    require(n >= 0 && n <= Int.MaxValue, s"implausible deletion-vector bitmap count $n")
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0L
    while (i < n) {
      val hi = Integer.reverseBytes(in.readInt()).toLong << 32
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(in)
      val it = rb.getIntIterator
      while (it.hasNext) out += (hi | (it.next() & 0xFFFFFFFFL))
      i += 1
    }
    require(out.length == cardinality,
      s"deletion vector cardinality ${out.length} != declared $cardinality — " +
        "refusing a bitmap that disagrees with its descriptor")
    out.toArray
  }

  /** Serialize row indexes as PROTOCOL.md's portable
    * RoaringBitmapArray — the exact inverse of [[decodeDvBitmap]];
    * the write side of the DV story lives on it.
    */
  private[graft] def encodeDvBitmap(indexes: Seq[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(1681511377))
    val byKey = indexes.groupBy(i => (i >>> 32).toInt).toSeq.sortBy(_._1)
    out.writeLong(java.lang.Long.reverseBytes(byKey.size.toLong))
    byKey.foreach { case (k, vs) =>
      out.writeInt(Integer.reverseBytes(k))
      val rb = new org.roaringbitmap.RoaringBitmap()
      vs.foreach(v => rb.add(v.toInt))
      rb.runOptimize()
      rb.serialize(out)
    }
    out.flush()
    bos.toByteArray
  }

  /** Slice one DV out of a sidecar file's bytes and decode it: version
    * byte 1 at offset 0, then at `offset` a big-endian int32 size, the
    * serialized bitmap, and a big-endian CRC-32 of exactly those bytes.
    */
  private[graft] def decodeDvFromFile(content: Array[Byte], offset: Int, sizeInBytes: Int,
                                      cardinality: Long): Array[Long] = {
    require(content.length > 0 && content(0) == 1,
      s"deletion vector file format version ${if (content.isEmpty) "?" else content(0)} != 1")
    val bb = java.nio.ByteBuffer.wrap(content)
    require(offset >= 1 && offset + 4 <= content.length,
      s"deletion vector offset $offset out of bounds (${content.length} bytes)")
    val size = bb.getInt(offset)
    require(size == sizeInBytes,
      s"deletion vector size $size at offset $offset != descriptor sizeInBytes $sizeInBytes")
    require(offset + 8 + size <= content.length,
      s"deletion vector data+checksum overruns the file (${content.length} bytes)")
    val data = java.util.Arrays.copyOfRange(content, offset + 4, offset + 4 + size)
    val crc = bb.getInt(offset + 4 + size)
    val c = new java.util.zip.CRC32(); c.update(data)
    require(c.getValue == (crc.toLong & 0xFFFFFFFFL),
      s"deletion vector checksum mismatch at offset $offset — refusing corrupt deletes")
    decodeDvBitmap(data, cardinality)
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

  /** A parquet checkpoint's metaData struct row re-serialized as the
    * action's JSON object — EVERY non-null field the checkpoint
    * carries rides along (format, name, description, createdTime…),
    * so the retained [[Snapshot.metaRaw]] matches what a commit-line
    * metaData action would have said, not a field subset.
    */
  private def structRowJson(r: org.apache.spark.sql.Row): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def node(v: Any): com.fasterxml.jackson.databind.JsonNode = v match {
      case null => om.nullNode()
      case s: String => om.getNodeFactory.textNode(s)
      case b: Boolean => om.getNodeFactory.booleanNode(b)
      case i: Int => om.getNodeFactory.numberNode(i)
      case l: Long => om.getNodeFactory.numberNode(l)
      case d: Double => om.getNodeFactory.numberNode(d)
      case f: Float => om.getNodeFactory.numberNode(f)
      case row: org.apache.spark.sql.Row => rowNode(row)
      case m: scala.collection.Map[_, _] =>
        val o = om.createObjectNode()
        m.foreach { case (k, v2) => o.set[com.fasterxml.jackson.databind.JsonNode](
          String.valueOf(k), node(v2)) }
        o
      case s: scala.collection.Seq[_] =>
        val a = om.createArrayNode()
        s.foreach(e => a.add(node(e)))
        a
      case other => om.getNodeFactory.textNode(String.valueOf(other))
    }
    def rowNode(row: org.apache.spark.sql.Row)
        : com.fasterxml.jackson.databind.node.ObjectNode = {
      val o = om.createObjectNode()
      row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i))
          o.set[com.fasterxml.jackson.databind.JsonNode](f, node(row.get(i)))
      }
      o
    }
    om.writeValueAsString(rowNode(r))
  }

  /** One JSON `add` action → AddFile (shared by the full replay and
    * the streaming tail's per-commit parse).
    */
  private def addFromJson(a: com.fasterxml.jackson.databind.JsonNode): AddFile = {
    val dv = if (a.has("deletionVector") && !a.get("deletionVector").isNull) {
      val d = a.get("deletionVector")
      Some(DvDescriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong()))
    } else None
    val pv = Option(a.get("partitionValues")).map { m =>
      val it = m.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey ->
        (if (e.getValue.isNull) null else e.getValue.asText()) }
      b.result()
    }.getOrElse(Map.empty[String, String])
    def optLong(name: String): Long =
      if (a.has(name) && !a.get(name).isNull) a.get(name).asLong() else 0L
    val stats =
      if (a.has("stats") && !a.get("stats").isNull && a.get("stats").asText().nonEmpty)
        Some(a.get("stats").asText())
      else None
    def optLongOpt(name: String): Option[Long] =
      if (a.has(name) && !a.get(name).isNull) Some(a.get(name).asLong()) else None
    AddFile(a.get("path").asText(), pv, optLong("size"), optLong("modificationTime"), dv,
      stats, optLongOpt("baseRowId"), optLongOpt("defaultRowCommitVersion"),
      if (a.has("clusteringProvider") && !a.get("clusteringProvider").isNull)
        Some(a.get("clusteringProvider").asText()) else None)
  }

  /** The adds and removes of ONE commit version, each with its
    * `dataChange` flag — the unit the streaming tail source consumes.
    * Refuses a version whose commit JSON was retention-cleaned: a
    * checkpoint is a snapshot, not a change list, so those versions'
    * changes are unrecoverable and pretending otherwise would silently
    * drop data from the stream.
    */
  private[graft] def commitChanges(s: SparkSession, dir: String, version: Long)
      : (Seq[(AddFile, Boolean)], Seq[(String, Boolean)]) = {
    val acts = commitActions(s, dir, version)
    (acts.collect { case (Right(af), dc) => af -> dc },
      acts.collect { case (Left(p), dc) => p -> dc })
  }

  /** One commit file's parsed content — everything the history family
    * (DESCRIBE HISTORY, readChanges/CDF tail, in-commit-timestamp
    * reads, VACUUM LITE's candidate scan) consumes. Parsed ONCE per
    * commit-file identity via [[CommitParseCache]].
    */
  private[graft] final case class CommitParse(
      fileActions: Seq[(Either[String, AddFile], Boolean)],
      cdc: Seq[AddFile],
      operation: Option[String], readVersion: Option[Long],
      engineInfo: Option[String], ict: Option[Long],
      metrics: Map[String, String] = Map.empty,
      params: Map[String, String] = Map.empty,
      // the column-mapping mode a metaData RESTATEMENT in this commit
      // declares ("none" when the restatement omits the key); None =
      // no metaData action — the window guards walk these to find
      // transitions whose endpoints agree (removal + re-upgrade)
      cmMode: Option[String] = None)

  /** Process-wide per-commit parse memo, validated by the commit
    * FILE's own (length, mtime) — deliberately NOT the snapshot
    * cache's whole-listing fingerprint: a new commit appearing in the
    * log must not invalidate parses of older, immutable ones (that
    * would make every DESCRIBE HISTORY after an append O(retained
    * log) again — the exact tax this memo removes). Commit JSONs never
    * change in place once committed (ICT stamping happens at write
    * time; log compaction and retention DELETE files, never edit), so
    * the per-file identity check is exact; the getFileStatus it needs
    * is the same presence probe the uncached readers already paid.
    * Entries are pure values (no DataFrames, no session binding), so
    * one bounded LRU serves every session in the JVM.
    */
  private[graft] object CommitParseCache {
    final case class Key(log: String, version: Long)
    // sized ABOVE a typical retained log (checkpoint-bounded replay
    // suffix plus retention window): an in-version-order walk over a
    // log larger than the LRU would evict every entry before its next
    // use and degrade to zero hits
    private val maxEntries = 1024
    private val entries =
      new java.util.LinkedHashMap[Key, (Long, Long, CommitParse)](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Key, (Long, Long, CommitParse)]): Boolean =
          size() > maxEntries
      }
    def get(key: Key, len: Long, mtime: Long): Option[CommitParse] = entries.synchronized {
      Option(entries.get(key)).collect { case (l, m, cp) if l == len && m == mtime => cp }
    }
    def put(key: Key, len: Long, mtime: Long, cp: CommitParse): Unit =
      entries.synchronized { entries.put(key, (len, mtime, cp)); () }
    private[graft] def clear(): Unit = entries.synchronized(entries.clear())
  }

  /** Counts ACTUAL commit-file parses (memo misses) — the spec's
    * evidence that N DESCRIBE HISTORY / readChanges calls parse each
    * retained commit once.
    */
  private[graft] val commitParseCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def parseCommitFile(fs: org.apache.hadoop.fs.FileSystem, p: Path): CommitParse = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val acts = Seq.newBuilder[(Either[String, AddFile], Boolean)]
    val cdc = Seq.newBuilder[AddFile]
    var op: Option[String] = None
    var readVersion: Option[Long] = None
    var engine: Option[String] = None
    var ict: Option[Long] = None
    var metrics: Map[String, String] = Map.empty
    var params: Map[String, String] = Map.empty
    var cmMode: Option[String] = None
    def dataChange(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
      !n.has("dataChange") || n.get("dataChange").isNull || n.get("dataChange").asBoolean()
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
    try Iterator.continually(rd.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty).foreach { line =>
        val n = om.readTree(line)
        if (n.has("add")) acts += Right(addFromJson(n.get("add"))) -> dataChange(n.get("add"))
        if (n.has("remove"))
          acts += Left(n.get("remove").get("path").asText()) -> dataChange(n.get("remove"))
        if (n.has("cdc")) cdc += addFromJson(n.get("cdc"))
        if (n.has("metaData")) {
          val conf = n.get("metaData").get("configuration")
          cmMode = Some(Option(conf).filterNot(_.isNull)
            .flatMap(c => Option(c.get("delta.columnMapping.mode")))
            .filterNot(_.isNull).map(_.asText()).getOrElse("none"))
        }
        if (n.has("commitInfo")) {
          val ci = n.get("commitInfo")
          op = Option(ci.get("operation")).filterNot(_.isNull).map(_.asText())
          readVersion = Option(ci.get("readVersion")).filterNot(_.isNull).map(_.asLong())
          engine = Option(ci.get("engineInfo")).filterNot(_.isNull).map(_.asText())
          ict = Option(ci.get("inCommitTimestamp")).filterNot(_.isNull).map(_.asLong())
          Option(ci.get("operationMetrics")).filterNot(_.isNull).foreach { mn =>
            val b = Map.newBuilder[String, String]
            mn.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
            metrics = b.result()
          }
          Option(ci.get("operationParameters")).filterNot(_.isNull).foreach { pn =>
            val b = Map.newBuilder[String, String]
            pn.fields().forEachRemaining(e => b += e.getKey ->
              (if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString))
            params = b.result()
          }
        }
      } finally rd.close()
    CommitParse(acts.result(), cdc.result(), op, readVersion, engine, ict, metrics,
      params, cmMode)
  }

  /** The FIRST column-mapping transition in versions
    * (fromVersion, toVersion] that breaks single-scan soundness — a
    * single scan under `snapTo`'s metadata resolves files written
    * anywhere in the window ONLY when no in-window metaData
    * restatement changes the mapping mode, except the additive
    * none→name upgrade (it stamps physicalName = each column's
    * then-current on-disk name, so earlier files keep resolving).
    * Endpoint comparison is NOT enough: a name→none REMOVAL followed
    * by a re-upgrade (or an upgrade followed by a removal) can leave
    * the endpoints agreeing while mid-window files are keyed by a
    * mapping `snapTo` no longer carries — those would silently
    * null-misread. Returns Some((version, modeBefore, modeAfter)) of
    * the first breaking transition, None when a single scan is sound.
    * Cost: O(window) memoized commit parses (the history family's
    * cache); retention-cleaned commits skip — the caller's own
    * classification raises the loud retention refusal.
    */
  private[graft] def cmTransitionBreak(s: SparkSession, dir: String,
      fromVersion: Long, toVersion: Long,
      snapTo: Snapshot): Option[(Long, String, String)] = {
    if (fromVersion >= toVersion) return None
    def modeOf(sn: Snapshot): String =
      sn.configuration.getOrElse("delta.columnMapping.mode", "none")
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(s.sessionState.newHadoopConf())
    var mode =
      try modeOf(snapshot(s, dir, Some(fromVersion)))
      catch { case scala.util.control.NonFatal(_) => modeOf(snapTo) }
    var break0: Option[(Long, String, String)] = None
    var v = fromVersion + 1
    while (v <= toVersion && break0.isEmpty) {
      parsedCommit(fs, logPath, v).flatMap(_.cmMode).foreach { m =>
        if (m != mode) {
          if (!(mode == "none" && m == "name")) break0 = Some((v, mode, m))
          mode = m
        }
      }
      v += 1
    }
    break0
  }

  /** The memoized parse of commit `version`, or None when its file is
    * absent (retention-cleaned / log-compacted).
    */
  private[graft] def parsedCommit(fs: org.apache.hadoop.fs.FileSystem, logPath: Path,
                                  version: Long): Option[CommitParse] = {
    val p = new Path(logPath, f"$version%020d.json")
    val st =
      try Some(fs.getFileStatus(p)).filter(_.isFile)
      catch { case _: java.io.FileNotFoundException => None }
    st.map { s0 =>
      val key = CommitParseCache.Key(fs.makeQualified(logPath).toString, version)
      CommitParseCache.get(key, s0.getLen, s0.getModificationTime).getOrElse {
        commitParseCounter.incrementAndGet()
        val cp = parseCommitFile(fs, p)
        // giant commits (a 100k-file overwrite's multi-MB JSON) parse
        // but never pin: 1024 such entries would be a driver-heap
        // hazard the memo's O(new commits) promise doesn't need —
        // history-family hot paths touch ordinary append/mutation
        // commits, and the rare giant re-parses at the same cost the
        // uncached readers always paid
        if (s0.getLen <= (4L << 20))
          CommitParseCache.put(key, s0.getLen, s0.getModificationTime, cp)
        cp
      }
    }
  }

  /** One commit's file actions IN LINE ORDER — `Right(add)` /
    * `Left(removedPath)` with the `dataChange` flag. Order matters to
    * state folding: a remove+add of the same path in one commit (the
    * shape of a DV rewrite) nets to the add only because the add comes
    * later.
    */
  private[graft] def commitActions(s: SparkSession, dir: String, version: Long)
      : Seq[(Either[String, AddFile], Boolean)] = {
    val hconf = s.sessionState.newHadoopConf()
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(hconf)
    parsedCommit(fs, logPath, version).getOrElse(throw new IllegalArgumentException(
      s"commit $version not present in $logPath (retention-cleaned?) — its changes " +
        "are unrecoverable from a checkpoint; cannot tail this version")).fileActions
  }

  /** One commit's `cdc` actions (change data files, PROTOCOL.md's
    * Change Data Feed) as AddFile shapes — path/partitionValues/size;
    * cdc files never carry deletion vectors.
    */
  private[graft] def commitCdc(s: SparkSession, dir: String, version: Long): Seq[AddFile] = {
    val hconf = s.sessionState.newHadoopConf()
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(hconf)
    parsedCommit(fs, logPath, version).getOrElse(throw new IllegalArgumentException(
      s"commit $version not present in $logPath (retention-cleaned?) — its change " +
        "data is unrecoverable; cannot read changes at this version")).cdc
  }

  /** Scan change data files: the table's data schema PLUS the
    * `_change_type` column the writer stored in them; partition
    * columns re-attach from the cdc actions' partitionValues, and a
    * column-mapped table's physical names project back to logical —
    * the same rules as [[scanFiles]], minus deletion vectors (cdc
    * files never carry them).
    */
  private def readCdcFiles(s: SparkSession, dir: String, snap: Snapshot,
                           files: Seq[AddFile], withPath: Boolean = false): DataFrame = {
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val cmMode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    val mapped = cmMode != "none"
    def physName(f: org.apache.spark.sql.types.StructField): String =
      if (!mapped) f.name
      else f.metadata.getString("delta.columnMapping.physicalName")
    // id mode: change-data files resolve by parquet field id like data
    // files ([[scanFiles]]); _change_type carries no id and matches by
    // its (protocol-fixed) name
    def withFieldId(f: org.apache.spark.sql.types.StructField)
        : org.apache.spark.sql.types.StructField =
      if (cmMode != "id") f
      else {
        require(f.metadata.contains("delta.columnMapping.id"),
          s"column mapping is 'id' but field '${f.name}' carries no " +
            "delta.columnMapping.id metadata — malformed schemaString")
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
          .build())
      }
    if (cmMode == "id") enableFieldIdReads(s)
    // nested physical names: the read schema carries the files'
    // physical names at EVERY level (DeltaStats.physicalShape — the
    // walker the write staging shares), casting changed structs back
    // to the logical shape on projection — cdc files of a foreign
    // per-level-named table must not null-fill their struct leaves
    def physDataType(dt: DataType): DataType =
      DeltaStats.physicalShape(dt, attachIds = cmMode == "id")
    val dataSchema = StructType(
      schema.fields.filterNot(f => snap.partCols.contains(f.name))
        .map(f => withFieldId(f.copy(name = physName(f),
          dataType = if (mapped) physDataType(f.dataType) else f.dataType))) :+
        org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType))
    val logicalByPhys = schema.fields.filterNot(f => snap.partCols.contains(f.name))
      .map { f =>
        val deep = if (mapped) physDataType(f.dataType) else f.dataType
        (physName(f), f.name,
          if (deep == f.dataType) None
          // cast back to the DEEP-NULLABLE logical shape: parquet reads
          // are nullable and a struct Cast refuses nullable→non-null
          else Some(DeltaStats.deepNullable(f.dataType)))
      } :+ (("_change_type", "_change_type", None))
    val partSchema = schema.fields.filter(f => snap.partCols.contains(f.name))
    val outNames = schema.fieldNames ++ Seq("_change_type") ++
      (if (withPath) Seq("__chg_path") else Nil)
    files.groupBy(_.partitionValues).map { case (pv, group) =>
      val paths = group.map(f => resolveAddPath(new Path(dir), f.path).toString)
      val base0 = s.read.schema(dataSchema).parquet(paths: _*)
      val proj = logicalByPhys.map { case (phys, logical, castBack) =>
        val c = base0.col(s"`${phys.replace("`", "``")}`")
        castBack.fold(c)(c.cast).as(logical)
      } ++ (if (withPath)
        Seq(uriPathCol(base0.col("_metadata.file_path")).as("__chg_path")) else Nil)
      val base = base0.select(proj.toIndexedSeq: _*)
      val withParts = partSchema.foldLeft(base) { (df, f) =>
        val raw = pv.get(physName(f)).orElse(pv.get(f.name)).orNull
        df.withColumn(f.name, lit(raw).cast(f.dataType))
      }
      withParts.select(outNames.map(col).toIndexedSeq: _*)
    }.reduce(_ unionByName _)
  }

  /** Read the table's row-level CHANGES for versions [fromVersion,
    * toVersion] — the Change Data Feed surface: the table's logical
    * columns plus `_change_type` ('insert' | 'delete' |
    * 'update_preimage' | 'update_postimage'), `_commit_version` and
    * `_commit_timestamp` (in-commit timestamp when stamped, else
    * monotone-adjusted commit-file mtime — delta-spark's CDF triple).
    *
    * Per commit: if it carries `cdc` actions, they ARE the change set
    * (the writer declared them complete — the protocol's rule).
    * Otherwise the changes derive from the file actions alone exactly
    * when that is sound: adds-only with dataChange=true → those files'
    * rows as 'insert' (the append shape); removes-only with
    * dataChange=true → the removed files' rows as 'delete' (resolved
    * against the PREVIOUS version's snapshot for partition values, and
    * only readable pre-vacuum); no dataChange actions at all →
    * nothing (compaction/checkpoint shapes). A commit that mixes
    * dataChange adds AND removes without cdc actions (a copy-on-write
    * delete/update/merge written WITHOUT CDF enabled, or a DV rewrite)
    * REFUSES loudly — its per-row changes are not derivable from file
    * actions, and delta-spark refuses the same way.
    *
    * Scale: driver state is O(actions in the window), and the PLAN is
    * O(1) in window size: all cdc files scan in one grouped pass and
    * all derived-insert files in another, each joined (broadcast) to a
    * tiny path→version map — a 10^4-version catch-up builds two scan
    * branches, not 10^4 (measured: the per-version-branch plan cost
    * was ~30 ms/version before this). The derivation for removes-only
    * commits pays one snapshot replay at v-1 (rare shape; our own
    * writers never produce it) and stays per-version.
    */
  def readChanges(s: SparkSession, dir: String,
                  fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val latest = snapshot(s, dir, None)
    require(fromVersion >= 0 && fromVersion <= toVersion && toVersion <= latest.version,
      s"readChanges: range [$fromVersion, $toVersion] outside [0, ${latest.version}]")
    val snapTo = if (toVersion == latest.version) latest else snapshot(s, dir, Some(toVersion))
    // a column-mapping REMOVAL inside the window re-keys change files:
    // versions before it are keyed by the OLD physical names, which
    // snapTo's logical read schema would silently null-misread (r17 —
    // caught by the removal repro). Refuse and name the split point —
    // delta-spark's CDF refuses non-additive schema changes the same
    // way. The none→name UPGRADE is additive here: it stamps
    // physicalName = each column's current name, so pre-upgrade files
    // keep resolving under snapTo; name→id never happens in graft.
    // the walk inspects every IN-WINDOW metaData restatement, not just
    // the endpoints: a removal + re-upgrade (or upgrade + removal)
    // leaves the endpoint modes agreeing while mid-window change files
    // are keyed by a mapping snapTo no longer carries. An unresolvable
    // fromVersion (retention-cleaned prefix) falls through — the
    // classification below raises its own loud retention refusal,
    // which must not be masked by this guard.
    cmTransitionBreak(s, dir, fromVersion, toVersion, snapTo).foreach {
      case (v, m0, m1) => throw new IllegalArgumentException(
        s"readChanges: the window [$fromVersion, $toVersion] crosses a " +
          s"column-mapping transition ('$m0' -> '$m1' at version $v) — change " +
          "files written before the transition are keyed by the old physical " +
          "names and would silently misread under the window-end schema; " +
          "split the read at the transition commit")
    }
    val schema = DataType.fromJson(snapTo.schemaJson).asInstanceOf[StructType]
    val outSchema = StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_commit_timestamp", org.apache.spark.sql.types.TimestampType)))
    val outCols = outSchema.fieldNames.map(col).toIndexedSeq
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    def normPath(p: String): String =
      fs.makeQualified(resolveAddPath(root, p)).toUri.getPath
    // `_commit_timestamp` per window version: the in-commit timestamp
    // when the table stamped it (authoritative — survives file
    // copies/moves that reset mtime), else the commit file's mtime,
    // adjusted MONOTONE over the retained chain exactly like
    // [[versionAtTimestamp]] — CDF consumers ordering by it must never
    // see a commit older than its predecessor
    val tsByVersion: Map[Long, Long] =
      commitTimestamps(fs, new Path(root, "_delta_log"), toVersion).toMap

    // classify the window on the driver — O(actions), no plan built yet
    val cdcFiles = Seq.newBuilder[(AddFile, Long)]
    val insertAdds = Seq.newBuilder[(AddFile, Long)]
    val removeGroups = Seq.newBuilder[(Seq[AddFile], Long)]
    (fromVersion to toVersion).foreach { v =>
      val cdc = commitCdc(s, dir, v)
      if (cdc.nonEmpty) cdc.foreach(c => cdcFiles += ((c, v)))
      else {
        val (adds, removes) = commitChanges(s, dir, v)
        val addsDc = adds.collect { case (af, true) => af }
        val remsDc = removes.collect { case (p, true) => p }
        if (addsDc.nonEmpty && remsDc.isEmpty)
          addsDc.foreach(a => insertAdds += ((a, v)))
        else if (remsDc.nonEmpty && addsDc.isEmpty) {
          val prev = snapshot(s, dir, Some(v - 1))
          val gone = remsDc.toSet
          val removedFiles = prev.active.filter(a => gone.contains(a.path))
          require(removedFiles.size == gone.size,
            s"readChanges: version $v removes ${gone.size} paths but only " +
              s"${removedFiles.size} resolve in version ${v - 1}'s snapshot — corrupt log")
          removeGroups += ((removedFiles, v))
        } else if (addsDc.isEmpty && remsDc.isEmpty) ()
        else throw new IllegalArgumentException(
          s"readChanges: version $v rewrites files (dataChange adds AND removes) " +
            "without change data files — its row-level changes are not derivable; " +
            "enable delta.enableChangeDataFeed before mutating, or read versions " +
            "around it")
      }
    }

    def versionMap(pairs: Seq[(AddFile, Long)], key: String): DataFrame = {
      import s.implicits._
      pairs.map { case (f, v) => (normPath(f.path), v, tsByVersion(v)) }
        .toDF(key, "_commit_version", "__ct_ms")
        .withColumn("_commit_timestamp",
          org.apache.spark.sql.functions.timestamp_millis(col("__ct_ms")))
        .drop("__ct_ms")
    }
    val parts = Seq.newBuilder[DataFrame]
    val cdcPairs = cdcFiles.result()
    if (cdcPairs.nonEmpty) {
      // one grouped scan of the DISTINCT files; a file referenced by
      // several commits (legal for the window) joins to each version
      val distinctFiles = cdcPairs.map(_._1).distinctBy(f => (f.path, f.partitionValues))
      parts += readCdcFiles(s, dir, snapTo, distinctFiles, withPath = true)
        .join(broadcast(versionMap(cdcPairs, "__chg_path")), "__chg_path")
        .select(outCols: _*)
    }
    val insPairs = insertAdds.result()
    if (insPairs.nonEmpty) {
      val distinctFiles = insPairs.map(_._1).distinctBy(f => (f.path, f.partitionValues))
      parts += scanFiles(s, dir, snapTo, distinctFiles, keepLineage = true)
        .withColumn("_change_type", lit("insert"))
        .join(broadcast(versionMap(insPairs, "__dv_path")), "__dv_path")
        .select(outCols: _*)
    }
    removeGroups.result().foreach { case (files, v) =>
      parts += scanFiles(s, dir, snapTo, files)
        .withColumn("_change_type", lit("delete"))
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          org.apache.spark.sql.functions.timestamp_millis(lit(tsByVersion(v))))
        .select(outCols: _*)
    }
    val built = parts.result()
    if (built.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    else built.reduce(_ unionByName _)
  }

  /** [[readChanges]] that SPLITS the window per-version when a
    * column-mapping transition breaks single-scan soundness
    * ([[cmTransitionBreak]]): each version then reads under its OWN
    * metadata and the slices union by the transition-invariant
    * LOGICAL names. For callers that only consume the logical CDF
    * shape — the streaming source's catch-up, incremental view
    * maintenance — this delivers correctly across a removal (or a
    * removal + re-upgrade round trip) where the strict
    * [[readChanges]] refuses; the strict form remains for callers
    * that must KNOW the window is homogeneous. The split path builds
    * one scan per version — acceptable exactly because transitions
    * are rare, priced rewrites.
    */
  def readChangesSplit(s: SparkSession, dir: String,
                       fromVersion: Long, toVersion: Long): DataFrame = {
    // the homogeneous fast path IS the strict call — its own guard
    // already runs the restatement walk, so re-checking here would
    // duplicate the snapshot probes on every transition-free window
    try readChanges(s, dir, fromVersion, toVersion)
    catch {
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("crosses a column-mapping transition") =>
        // per-version slices, each read under its OWN metadata, then
        // PROJECTED to the window-end logical schema (+ CDF columns)
        // before the union — exactly what the grouped read produces
        // for windows it can serve: a column added mid-window
        // null-fills in earlier slices, a dropped column's values
        // disappear, a widened column upcasts. A raw unionByName
        // would instead throw an undiagnosable resolution error the
        // moment a transition-crossing window also contains a schema
        // change.
        val snapTo = snapshot(s, dir, Some(toVersion))
        val logical = DataType.fromJson(snapTo.schemaJson).asInstanceOf[StructType]
        val want: Seq[(String, org.apache.spark.sql.types.DataType)] =
          logical.fields.map(f => (f.name, f.dataType)).toSeq ++ Seq(
            ("_change_type", org.apache.spark.sql.types.StringType),
            ("_commit_version", org.apache.spark.sql.types.LongType),
            ("_commit_timestamp", org.apache.spark.sql.types.TimestampType))
        (fromVersion to toVersion).map { v =>
          val df = readChanges(s, dir, v, v)
          df.select(want.map { case (n, dt) =>
            (if (df.columns.contains(n)) col(n).cast(dt)
             else org.apache.spark.sql.functions.lit(null).cast(dt)).as(n)
          }.toIndexedSeq: _*)
        }.reduce(_ unionByName _)
    }
  }

  /** ONE version's ordered change-file payload — the unit list the
    * streaming source's intra-version admission slices (delta-spark's
    * CDF offsets carry file indexes for the same reason): the commit's
    * `cdc` files when the writer staged them, else its dataChange adds
    * (the insert-derivable shape), PATH-SORTED so the list is an
    * immutable pure function of the version and a restart re-resolves
    * it identically. Versions whose changes are not file-sliceable
    * (removes-only, metadata-only, compaction) answer empty — they
    * budget as zero payload and always ride whole.
    */
  private[graft] def cdfVersionPayload(s: SparkSession, dir: String,
                                       version: Long): IndexedSeq[AddFile] = {
    val cdc = commitCdc(s, dir, version)
    if (cdc.nonEmpty) cdc.sortBy(_.path).toIndexedSeq
    else {
      val (adds, removes) = commitChanges(s, dir, version)
      val addsDc = adds.collect { case (af, true) => af }
      val remsDc = removes.collect { case (p, true) => p }
      if (addsDc.nonEmpty && remsDc.isEmpty) addsDc.sortBy(_.path).toIndexedSeq
      else IndexedSeq.empty
    }
  }

  /** Change rows for files [from, until) of ONE version's payload
    * ([[cdfVersionPayload]]) — the same CDF triple as [[readChanges]]
    * (`_change_type`, `_commit_version`, `_commit_timestamp`), used by
    * the streaming source when a single huge commit (a backfill, a
    * giant MERGE) must split across micro-batches instead of arriving
    * as one batch no cluster sizes for. The union of a version's
    * slices is exactly `readChanges(v, v)` for the sliceable shapes.
    */
  private[graft] def readChangesSlice(s: SparkSession, dir: String, version: Long,
                                      from: Long, until: Long): DataFrame = {
    val payload = cdfVersionPayload(s, dir, version)
    require(payload.nonEmpty,
      s"readChangesSlice: version $version of $dir has no sliceable change payload")
    val snap = snapshot(s, dir, Some(version))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val outSchema = StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_commit_timestamp", org.apache.spark.sql.types.TimestampType)))
    val outCols = outSchema.fieldNames.map(col).toIndexedSeq
    val hi = math.min(until, payload.length.toLong)
    if (hi <= from)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val slice = payload.slice(from.toInt, hi.toInt)
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    // loud like readChanges' tsByVersion(v): a missing timestamp means
    // the commit vanished between offset resolution and the scan —
    // stamping epoch 0 would silently misplace the batch for every
    // consumer ordering by _commit_timestamp
    val ts = commitTimestamps(fs, new Path(root, "_delta_log"), version).toMap
      .getOrElse(version, throw new IllegalStateException(
        s"readChangesSlice: no commit timestamp for version $version of $dir — " +
          "the commit was cleaned mid-stream; restart the stream"))
    val isCdc = commitCdc(s, dir, version).nonEmpty
    val base =
      if (isCdc) readCdcFiles(s, dir, snap, slice)
      else scanFiles(s, dir, snap, slice).withColumn("_change_type", lit("insert"))
    base
      .withColumn("_commit_version", lit(version))
      .withColumn("_commit_timestamp",
        org.apache.spark.sql.functions.timestamp_millis(lit(ts)))
      .select(outCols: _*)
  }

  /** Process-wide snapshot cache. A session running N queries against
    * one table must not pay N× (commit-suffix JSON parse + checkpoint
    * DataFrame setup + the gated `active` collect) — real delta-spark
    * caches Snapshot per (log, version) for the same reason. Entries
    * are validated by a FINGERPRINT of the `_delta_log` listing
    * (names + lengths + mtimes, `_sidecars` included), so the cache is
    * correct by construction against every way the log can change —
    * graft commits, foreign writers, checkpoints, log compaction,
    * VACUUM's retention cleaning, even a test fixture deleting commit
    * files in place — with no invalidation hooks to miss: any listing
    * change is a miss and a fresh replay. The validation probe costs
    * one `listStatus` the replay needed anyway; what the hit skips is
    * all parsing, DataFrame construction and (via the Snapshot's lazy
    * `active`) the distributed resolve + gated collect.
    *
    * Keys carry the SparkSession identity: a Snapshot holds DataFrames
    * bound to the session that built it, so entries never cross
    * sessions. Bounded LRU (`spark.graft.delta.snapshotCache.maxEntries`,
    * default 32 — each entry may pin up to a maxSnapshotFiles-gated
    * file list, the same driver-heap class one in-flight query holds);
    * `spark.graft.delta.snapshotCache.enabled=false` bypasses entirely.
    */
  private[graft] object SnapshotCache {
    /** The SESSION rides in the key by reference (SparkSession keeps
      * AnyRef equality): a cached Snapshot's DataFrames are bound to
      * the session that built them, and keying by any derived integer
      * (an identity hash, say) could collide two live sessions into
      * one entry — handing one of them plans bound to the other.
      * `maxFiles` is part of the key because the gated resolve's
      * REFUSAL behavior is a function of it: a session that tightens
      * spark.graft.delta.maxSnapshotFiles must see a fresh resolve
      * that enforces the new gate, not a list materialized under the
      * old one.
      */
    final case class Key(session: SparkSession, logDir: String,
                         version: Long, maxFiles: Long)
    @volatile private var maxEntries = 32
    private val entries = new java.util.LinkedHashMap[Key, (Long, Snapshot)](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Key, (Long, Snapshot)]): Boolean =
        size() > maxEntries
    }
    def get(key: Key, fingerprint: Long): Option[Snapshot] = entries.synchronized {
      Option(entries.get(key)).collect { case (fp, snap) if fp == fingerprint => snap }
    }
    def put(key: Key, fingerprint: Long, snap: Snapshot, max: Int): Unit =
      entries.synchronized {
        maxEntries = max
        // a stopped session's entries can never hit again (its plans
        // are unusable) — sweep them so they stop pinning the session
        // and its DataFrames until LRU displacement
        val it = entries.keySet().iterator()
        while (it.hasNext) {
          if (it.next().session.sparkContext.isStopped) it.remove()
        }
        entries.put(key, (fingerprint, snap))
      }
    private[graft] def clear(): Unit = entries.synchronized(entries.clear())
  }

  /** Counts ACTUAL log replays (cache misses) — the spec's evidence
    * that N repeated reads at one version replay once.
    */
  private[graft] val replayCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** 64-bit FNV-1a over the sorted (name, length, mtime) triples of
    * the log listing plus the `_sidecars` listing when present — any
    * file appearing, disappearing or changing shape in the log
    * directory changes the fingerprint.
    */
  private def logFingerprint(fs: org.apache.hadoop.fs.FileSystem,
                             entries: Seq[org.apache.hadoop.fs.FileStatus]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(x: Long): Unit = { h ^= x; h *= 0x100000001b3L }
    def mixStr(str: String): Unit = { str.foreach(c => mix(c.toLong)); mix(-1L) }
    val sidecars = entries.find(st => st.isDirectory && st.getPath.getName == "_sidecars")
      .map(st => fs.listStatus(st.getPath).toSeq).getOrElse(Nil)
    (entries ++ sidecars).sortBy(_.getPath.toString).foreach { st =>
      mixStr(st.getPath.getName); mix(st.getLen); mix(st.getModificationTime)
    }
    h
  }

  /** Replay the log to the target version: commit JSON driver-parsed
    * (bounded by checkpointInterval), checkpoint adds distributed with
    * lazy gated resolution (see class scaladoc); every FS touch goes
    * through `fs`. Resolved snapshots are served from [[SnapshotCache]]
    * while the log listing is byte-for-byte unchanged.
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
    // classic, multi-part AND v2-manifest
    // (NNN.checkpoint.<uniqueStr>.{json,parquet}) checkpoint names
    val checkpoints: Seq[(Long, Seq[Path])] = entries
      .filter(st => st.isFile &&
        (st.getPath.getName.matches("\\d{20}\\.checkpoint(\\.\\d{10}\\.\\d{10})?\\.parquet") ||
          st.getPath.getName.matches("\\d{20}\\.checkpoint\\.[A-Za-z0-9_-]+\\.(json|parquet)")))
      .map(_.getPath)
      .groupBy(_.getName.take(20).toLong)
      .map { case (v, ps) => v -> ps.sortBy(_.getName) }
      .toSeq.sortBy(_._1)
    // a compaction file's END version is a reachable state even after
    // the covered commits were retention-cleaned (its reconciled
    // actions ARE versions x..y); intermediate versions inside a
    // cleaned range are not
    val compactedEnds = entries
      .filter(st => st.isFile &&
        st.getPath.getName.matches("\\d{20}\\.\\d{20}\\.compacted\\.json"))
      .map(_.getPath.getName.slice(21, 41).toLong)
    val target = versionAsOf.getOrElse(
      (commits.map(_._1) ++ checkpoints.map(_._1) ++ compactedEnds).maxOption.getOrElse(
        sys.error(s"empty _delta_log: $dir")))
    versionAsOf.foreach { v =>
      require(commits.exists(_._1 == v) || checkpoints.exists(_._1 == v) ||
          compactedEnds.contains(v),
        s"versionAsOf $v not present in $logPath")
    }

    // cache lookup: key on the RESOLVED version (a latest-read and an
    // explicit versionAsOf at the same version share one entry),
    // validated by the listing fingerprint computed above the replay
    val cacheOn = s.conf.get("spark.graft.delta.snapshotCache.enabled", "true").toBoolean
    val fingerprint = if (cacheOn) logFingerprint(fs, entries) else 0L
    val cacheKey = SnapshotCache.Key(s,
      fs.makeQualified(logPath).toString, target,
      s.conf.getOption("spark.graft.delta.maxSnapshotFiles").map(_.toLong).getOrElse(4000000L))
    if (cacheOn) {
      val hit = SnapshotCache.get(cacheKey, fingerprint)
      if (hit.isDefined) return hit.get
    }
    replayCounter.incrementAndGet()

    // Last action per path in the post-checkpoint commit SUFFIX:
    // Some(add) = live (re-)add, None = removed. The suffix is bounded
    // by checkpointInterval, so this map stays small no matter how many
    // live files the table has — the checkpoint's own add entries never
    // come to the driver here (see the resolution thunk below).
    val suffix = scala.collection.mutable.LinkedHashMap.empty[String, Option[AddFile]]
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Nil
    var minReader = 1L
    var minWriter = 1L
    var readerFeatures: Set[String] = Set.empty
    var writerFeatures: Set[String] = Set.empty
    var configuration: Map[String, String] = Map.empty
    var txns: Map[String, Long] = Map.empty
    var metaId: Option[String] = None
    // the metaData action's inner object, VERBATIM from wherever it
    // was ingested (commit line / JSON manifest: the raw node;
    // parquet checkpoint: the struct row re-serialized with every
    // field it carries). The version-checksum re-seed copies this
    // node into the .crc — delta-spark loads protocol/metadata
    // straight from the .crc (read-from-checksum optimization) and
    // compares it against replayed state, so a reconstructed field
    // subset (no format/name/createdTime) would diverge there.
    var metaRaw: Option[String] = None
    // domain → configuration (JSON string), last-writer-wins per
    // domain; removed=true deletes the domain (PROTOCOL.md domain
    // metadata — the row-tracking high watermark lives in
    // `delta.rowTracking`)
    var domainMeta: Map[String, String] = Map.empty

    // base: the newest checkpoint at or below the target version —
    // exactly how a real Delta reader avoids replaying the full log.
    // Its add entries are kept as a DATAFRAME (distributed), not
    // collected: a 100-TB table's checkpoint holds millions of adds.
    var cpAddsDf: Option[DataFrame] = None
    // ONE filtered-and-projected job collects the scalar actions
    // (metaData/protocol/txn) of a parquet checkpoint/manifest — the
    // add entries never ride along
    def ingestScalars(cp: DataFrame): Unit = {
      val cols = cp.columns.toSet
      val scalarCols = Seq("metaData", "protocol", "txn", "domainMetadata").filter(cols)
      val rows =
        if (scalarCols.isEmpty) Array.empty[org.apache.spark.sql.Row]
        else cp.where(scalarCols.map(c => col(c).isNotNull)
            .reduce(_ || _))
          .select(scalarCols.map(col): _*).collect()
      rows.foreach { r =>
        val cols = r.schema.fieldNames.toSet
        if (cols("metaData") && !r.isNullAt(r.fieldIndex("metaData"))) {
          val md = r.getStruct(r.fieldIndex("metaData"))
          val mdFields = md.schema.fieldNames.toSet
          schemaJson = Some(md.getString(md.fieldIndex("schemaString")))
          partCols = md.getSeq[String](md.fieldIndex("partitionColumns"))
          if (mdFields("configuration") && !md.isNullAt(md.fieldIndex("configuration")))
            configuration = md.getMap[String, String](md.fieldIndex("configuration")).toMap
          if (mdFields("id") && !md.isNullAt(md.fieldIndex("id")))
            metaId = Some(md.getString(md.fieldIndex("id")))
          metaRaw = Some(structRowJson(md))
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
        if (cols("domainMetadata") && !r.isNullAt(r.fieldIndex("domainMetadata"))) {
          val dm = r.getStruct(r.fieldIndex("domainMetadata"))
          val domain = dm.getString(dm.fieldIndex("domain"))
          val removed = !dm.isNullAt(dm.fieldIndex("removed")) &&
            dm.getBoolean(dm.fieldIndex("removed"))
          if (removed) domainMeta -= domain
          else domainMeta += domain -> dm.getString(dm.fieldIndex("configuration"))
        }
      }
    }
    val base = checkpoints.filter(_._1 <= target).lastOption
    base.foreach { case (v, psAll) =>
      // several checkpoint forms may coexist at one version; each
      // complete form is a full snapshot by itself, so pick ONE —
      // mixing forms in one read would double-count adds. Preference:
      // classic single file, then a V2 manifest, then multi-part.
      val classic = psAll.filter(_.getName.matches("\\d{20}\\.checkpoint\\.parquet"))
      val v2 = psAll.filter(_.getName.matches(
        "\\d{20}\\.checkpoint\\.[A-Za-z0-9_-]+\\.(json|parquet)")).sortBy(_.getName)
      if (classic.nonEmpty || v2.isEmpty) {
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
        if (cp.columns.contains("add")) cpAddsDf = Some(checkpointAdds(cp))
        ingestScalars(cp)
      } else {
        // V2 spec checkpoint (reader feature `v2Checkpoints`):
        // `<v>.checkpoint.<uniqueStr>.{json|parquet}` is a MANIFEST —
        // non-file actions plus a `checkpointMetadata` (version
        // verified) and optional `sidecar` actions naming parquet
        // files under _delta_log/_sidecars/ that hold the add state.
        // Several uniqueStrs may coexist (each complete): take the
        // lexicographically first for determinism. File actions stay
        // DISTRIBUTED: sidecars are a parquet scan; inline adds of a
        // parquet manifest likewise. A JSON manifest is driver-parsed
        // (the format puts bulk adds in sidecars for exactly this
        // reason).
        val mPath = v2.head
        val sidecarDir = new Path(logPath, "_sidecars")
        if (mPath.getName.endsWith(".parquet")) {
          val mf = s.read.parquet(mPath.toString)
          val cols = mf.columns.toSet
          require(!cols("checkpointMetadata") || {
            val cm = mf.where(col("checkpointMetadata").isNotNull)
              .select("checkpointMetadata.version").collect()
            cm.isEmpty || cm(0).getAs[Number](0).longValue() == v
          }, s"v2 checkpoint ${mPath.getName} declares a different version than its " +
            "file name — corrupt manifest, refusing")
          val sidecars =
            if (!cols("sidecar")) Nil
            else mf.where(col("sidecar").isNotNull).select("sidecar.path")
              .collect().map(r => new Path(sidecarDir, r.getString(0)).toString).toSeq
          sidecars.foreach(p => require(fs.exists(new Path(p)),
            s"v2 checkpoint sidecar $p missing — refusing a partial snapshot"))
          val inline = if (cols("add")) Some(checkpointAdds(mf)) else None
          val side =
            if (sidecars.isEmpty) None
            else Some(checkpointAdds(s.read.parquet(sidecars: _*)))
          cpAddsDf = (inline, side) match {
            case (Some(a), Some(b)) => Some(a.unionByName(b))
            case (a, b) => a.orElse(b)
          }
          ingestScalars(mf)
        } else {
          // JSON manifest: same actions, one line each
          val om0 = new com.fasterxml.jackson.databind.ObjectMapper()
          val inline = Seq.newBuilder[AddFile]
          val sidecars = Seq.newBuilder[String]
          val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(mPath), java.nio.charset.StandardCharsets.UTF_8))
          try Iterator.continually(rd.readLine()).takeWhile(_ != null)
            .filter(_.nonEmpty).foreach { line =>
              val n = om0.readTree(line)
              if (n.has("checkpointMetadata"))
                require(n.get("checkpointMetadata").get("version").asLong() == v,
                  s"v2 checkpoint ${mPath.getName} declares a different version than " +
                    "its file name — corrupt manifest, refusing")
              if (n.has("sidecar"))
                sidecars += new Path(sidecarDir,
                  n.get("sidecar").get("path").asText()).toString
              if (n.has("add")) inline += addFromJson(n.get("add"))
              if (n.has("metaData")) {
                val md = n.get("metaData")
                metaRaw = Some(md.toString)
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
                Option(pr.get("readerFeatures")).filterNot(_.isNull).foreach { fs0 =>
                  readerFeatures = (0 until fs0.size()).map(fs0.get(_).asText()).toSet
                }
                Option(pr.get("writerFeatures")).filterNot(_.isNull).foreach { fs0 =>
                  writerFeatures = (0 until fs0.size()).map(fs0.get(_).asText()).toSet
                }
              }
              if (n.has("txn")) {
                val tx = n.get("txn")
                txns += tx.get("appId").asText() -> tx.get("version").asLong()
              }
              if (n.has("domainMetadata")) {
                val dm = n.get("domainMetadata")
                val domain = dm.get("domain").asText()
                if (dm.has("removed") && dm.get("removed").asBoolean()) domainMeta -= domain
                else domainMeta += domain -> dm.get("configuration").asText()
              }
            } finally rd.close()
          val sidecarPaths = sidecars.result()
          sidecarPaths.foreach(p => require(fs.exists(new Path(p)),
            s"v2 checkpoint sidecar $p missing — refusing a partial snapshot"))
          val side =
            if (sidecarPaths.isEmpty) None
            else Some(checkpointAdds(s.read.parquet(sidecarPaths: _*)))
          val inlineAdds = inline.result()
          val inlineDf =
            if (inlineAdds.isEmpty) None else Some(addsAsResolveDf(s, inlineAdds))
          cpAddsDf = (inlineDf, side) match {
            case (Some(a), Some(b)) => Some(a.unionByName(b))
            case (a, b) => a.orElse(b)
          }
        }
      }
    }

    // replay (base, target] in version order; action order inside a
    // segment is preserved by per-line parsing. The chain must be
    // CONTIGUOUS from the base: a gap means log retention cleaned
    // commits this replay needs — a silent partial snapshot otherwise.
    // LOG COMPACTION files (`<x>.<y>.compacted.json`, PROTOCOL.md)
    // substitute for the whole range [x, y] when fully inside the
    // window — the reconciled actions replace x..y's commit JSONs, so
    // a long suffix reads as a few files and retention may clean the
    // covered commits without breaking replay.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val compactedFiles: Seq[(Long, Long, Path)] = entries
      .filter(st => st.isFile &&
        st.getPath.getName.matches("\\d{20}\\.\\d{20}\\.compacted\\.json"))
      .map { st =>
        val n = st.getPath.getName
        (n.take(20).toLong, n.slice(21, 41).toLong, st.getPath)
      }.sortBy(_._1)
    val commitByV = commits.toMap
    val baseV = base.map(_._1).getOrElse(-1L)
    val segs = Seq.newBuilder[Path]
    var vcur = baseV + 1
    while (vcur <= target) {
      // a range STARTING at or before vcur serves too (straddling the
      // checkpoint base): its actions are final-per-path, so the ones
      // the base already reflects reapply idempotently
      val cov = compactedFiles.filter(c => c._1 <= vcur && c._2 >= vcur && c._2 <= target)
      if (cov.nonEmpty) {
        val best = cov.maxBy(_._2)
        segs += best._3
        vcur = best._2 + 1
      } else commitByV.get(vcur) match {
        case Some(p) => segs += p; vcur += 1
        case None => throw new IllegalArgumentException(
          s"commit $vcur missing and no compaction file covers it — the chain " +
            s"(${baseV + 1} to $target) is not reconstructible in $logPath " +
            "(log cleaned past the newest usable checkpoint?); refusing a partial snapshot")
      }
    }
    segs.result()
      .foreach { p =>
        val in = fs.open(p)
        val rd = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        try Iterator.continually(rd.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty).foreach { line =>
          val n = om.readTree(line)
          if (n.has("add")) {
            val af = addFromJson(n.get("add"))
            suffix(af.path) = Some(af)
          }
          if (n.has("remove")) suffix(n.get("remove").get("path").asText()) = None
          if (n.has("metaData")) {
            val md = n.get("metaData")
            metaRaw = Some(md.toString)
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
            // the LATEST protocol action wins ENTIRELY (PROTOCOL.md) —
            // replacement, not upgrade-merge, so DROP FEATURE's
            // downgrade restatement takes effect; an action below the
            // feature-table thresholds carries no feature lists, which
            // MEANS none
            minReader = pr.get("minReaderVersion").asLong()
            minWriter = pr.get("minWriterVersion").asLong()
            readerFeatures = Option(pr.get("readerFeatures")).filterNot(_.isNull).map { fs0 =>
              (0 until fs0.size()).map(fs0.get(_).asText()).toSet
            }.getOrElse(Set.empty)
            writerFeatures = Option(pr.get("writerFeatures")).filterNot(_.isNull).map { fs0 =>
              (0 until fs0.size()).map(fs0.get(_).asText()).toSet
            }.getOrElse(Set.empty)
          }
          if (n.has("txn")) {
            val tx = n.get("txn")
            // later commits override: the latest version per appId is
            // the idempotence watermark a streaming writer consults
            txns += tx.get("appId").asText() -> tx.get("version").asLong()
          }
          if (n.has("domainMetadata")) {
            val dm = n.get("domainMetadata")
            val domain = dm.get("domain").asText()
            if (dm.has("removed") && dm.get("removed").asBoolean()) domainMeta -= domain
            else domainMeta += domain -> dm.get("configuration").asText()
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
      // vacuumProtocolCheck mandates that VACUUM implementations
      // consult the protocol before reclaiming — graft's vacuum
      // resolves the snapshot through this very gate, so the
      // obligation holds by construction and the feature is pure
      // interop breadth
      // variantShredding (r17): the table MAY hold parquet files whose
      // variant columns are SHREDDED (metadata/value/typed_value
      // groups) — Spark 4's parquet row converter reassembles them
      // natively under spark.sql.variant.allowReadingShredded, so the
      // scan path reads both layouts through the declared VariantType
      val unsupported = readerFeatures -- Set("columnMapping", "deletionVectors",
        "v2Checkpoints", "typeWidening", "variantType", "timestampNtz",
        "vacuumProtocolCheck", "variantShredding")
      require(unsupported.isEmpty,
        s"unsupported Delta reader features ${unsupported.mkString(", ")} " +
          "(columnMapping, deletionVectors, v2Checkpoints, typeWidening, " +
          "variantShredding and vacuumProtocolCheck are implemented) — " +
          "refusing to misread the table")
    }
    val cmMode = configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name" || cmMode == "id",
      s"delta.columnMapping.mode '$cmMode' not supported (none/name/id) — " +
        "refusing to misread the table")
    // Last-writer-wins resolution, exploiting that the commit suffix is
    // SMALL (bounded by checkpointInterval) while the checkpoint may be
    // huge: a checkpoint add survives iff NO later commit touched its
    // path (broadcast anti-join, executed on executors); a touched path
    // is governed by the suffix's final action for it. The final file
    // list is what the scan needs on the driver anyway — its collect is
    // gated by spark.graft.delta.maxSnapshotFiles.
    val suffixFinal = suffix.toVector
    val cpDf = cpAddsDf
    def matches(af: AddFile, p: Map[String, String]): Boolean =
      p.forall { case (k, v) => af.partitionValues.get(k).contains(v) }
    val resolveFn: Option[Map[String, String]] => Seq[AddFile] = { partition =>
      val survivors = suffixFinal.collect {
        case (_, Some(af)) if partition.forall(matches(af, _)) => af
      }
      cpDf match {
        case None => survivors
        case Some(adds) =>
          import org.apache.spark.sql.functions.broadcast
          import s.implicits._
          // partition pruning BEFORE the anti-join and the gated
          // collect — the pushed map-key equality prunes inside the
          // distributed resolve, so the driver only ever sees the
          // matching partitions' entries
          val pruned = partition match {
            case None => adds
            case Some(p) => p.foldLeft(adds) { case (df, (k, v)) =>
              df.where(col("pv").getItem(k) === lit(v))
            }
          }
          val resolved =
            if (suffixFinal.isEmpty) pruned
            else pruned.join(broadcast(suffixFinal.map(_._1).toDF("path")),
              Seq("path"), "left_anti")
          val maxFiles = s.conf.getOption("spark.graft.delta.maxSnapshotFiles")
            .map(_.toLong).getOrElse(4000000L)
          val take = resolved.take(math.min(maxFiles, Int.MaxValue - 2L).toInt + 1)
          require(take.length <= maxFiles,
            s"snapshot at version $target has more than $maxFiles live files" +
              partition.map(p => s" in partition $p").getOrElse("") +
              " — each AddFile costs driver heap (path + partition values + DV " +
              "descriptor); raise spark.graft.delta.maxSnapshotFiles only with " +
              "driver memory to match, or prune with readPartition")
          val cpActive = take.iterator.map { r =>
            val dv =
              if (r.isNullAt(4)) None
              else Some(DvDescriptor(r.getString(4), r.getString(5),
                if (r.isNullAt(6)) None else Some(r.getInt(6)),
                r.getInt(7), r.getLong(8)))
            AddFile(r.getString(0),
              Option(r.getMap[String, String](1)).map(_.toMap)
                .getOrElse(Map.empty[String, String]),
              if (r.isNullAt(2)) 0L else r.getLong(2),
              if (r.isNullAt(3)) 0L else r.getLong(3), dv,
              if (r.isNullAt(9)) None else Some(r.getString(9)),
              if (r.isNullAt(10)) None else Some(r.getLong(10)),
              if (r.isNullAt(11)) None else Some(r.getLong(11)),
              if (r.isNullAt(12)) None else Some(r.getString(12)))
          }.toVector
          cpActive ++ survivors
      }
    }
    // checkpointProtection (PROTOCOL.md, stamped by a TRUNCATE HISTORY
    // feature drop): a snapshot AT or ABOVE the boundary must replay
    // from a checkpoint at/above it — a from-JSON replay would cross
    // the dropped feature's historical actions, the exact exposure the
    // feature exists to close. Time travel BELOW the boundary is
    // unaffected (that region's protocol actions declare its features
    // and gate as usual).
    configuration.get("delta.requireCheckpointProtectionBeforeVersion")
      .map(_.toLong).filter(_ > 0)
      .filterNot(_ => s.conf.get(
        "spark.graft.delta.ignoreCheckpointProtection", "false").toBoolean)
      .foreach { bound =>
        val baseV = base.map(_._1).getOrElse(-1L)
        require(baseV >= bound - 1,
          s"snapshot at version $target replays JSON history across the table's " +
            s"checkpoint protection boundary $bound (base: " +
            (if (baseV < 0) "version 0, no checkpoint" else s"checkpoint $baseV") +
            ") — a TRUNCATE HISTORY feature drop protects that history; replay " +
            "from a checkpoint at or above the boundary. If the boundary " +
            "checkpoint was deleted, repair under " +
            "spark.graft.delta.ignoreCheckpointProtection=true (this reader " +
            "understands every feature graft drops) by re-authoring it with " +
            "LakeWriter.checkpointDelta, then unset the flag")
      }
    val snap = new Snapshot(target, resolveFn,
      schemaJson.getOrElse(sys.error(s"no metaData action found in $logPath")),
      partCols, minReader, configuration,
      minWriter, readerFeatures.toSeq.sorted, writerFeatures.toSeq.sorted, txns, metaId,
      domainMeta, cpAddsDf, suffixFinal, metaRaw)
    if (cacheOn) SnapshotCache.put(cacheKey, fingerprint, snap,
      s.conf.get("spark.graft.delta.snapshotCache.maxEntries", "32").toInt)
    snap
  }

  /** A checkpoint's `add` entries flattened to the resolution schema —
    * field order is load-bearing for the collect above. Optional
    * fields (size, modificationTime, deletionVector) may be absent in
    * minimal or foreign checkpoints; they surface as typed nulls.
    */
  /** id-mode scans need Spark's parquet field-id resolution. The
    * switch is a SESSION conf (the scan is lazy, so a scoped
    * save-and-restore cannot work): an UNSET session turns it on —
    * only schemas that carry `parquet.field.id` metadata are affected,
    * i.e. exactly the id-mode scans built here — while a session that
    * EXPLICITLY set it false (e.g. to ignore a dataset's stale ids)
    * refuses loudly instead of being silently overridden.
    */
  private def enableFieldIdReads(s: SparkSession): Unit = {
    val k = "spark.sql.parquet.fieldId.read.enabled"
    // contains() sees only EXPLICIT settings (getOption surfaces the
    // registered default, which is false)
    val explicitlyOff = s.sessionState.conf.contains(k) &&
      s.conf.get(k) == "false"
    require(!explicitlyOff,
      s"column mapping 'id' resolves by parquet field id, which needs $k=true — " +
        "this session explicitly sets it false; unset it to read id-mode tables")
    s.conf.set(k, "true")
  }

  private def checkpointAdds(cp: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, MapType, StringType}
    val addT = cp.schema("add").dataType.asInstanceOf[StructType]
    val af = addT.fieldNames.toSet
    def opt(n: String, t: DataType) =
      (if (af(n)) col(s"add.$n") else lit(null)).cast(t)
    val dvT = if (af("deletionVector"))
      Some(addT("deletionVector").dataType.asInstanceOf[StructType]) else None
    def dvOpt(n: String, t: DataType) = (dvT match {
      case Some(d) if d.fieldNames.contains(n) => col(s"add.deletionVector.$n")
      case _ => lit(null)
    }).cast(t)
    cp.where(col("add").isNotNull).select(
      col("add.path").cast(StringType).as("path"),
      opt("partitionValues", MapType(StringType, StringType)).as("pv"),
      opt("size", LongType).as("size"),
      opt("modificationTime", LongType).as("mtime"),
      dvOpt("storageType", StringType).as("dv_st"),
      dvOpt("pathOrInlineDv", StringType).as("dv_p"),
      dvOpt("offset", IntegerType).as("dv_off"),
      dvOpt("sizeInBytes", IntegerType).as("dv_sz"),
      dvOpt("cardinality", LongType).as("dv_card"),
      // a foreign checkpoint written with writeStatsAsStruct=true +
      // writeStatsAsJson=false carries ONLY add.stats_parsed — render
      // the struct back to the JSON form the pruner reads, or data
      // skipping silently dies on such tables. UTC + micros precision
      // so temporal bounds round-trip losslessly.
      (if (af("stats_parsed"))
        org.apache.spark.sql.functions.coalesce(
          (if (af("stats")) col("add.stats") else lit(null)).cast(StringType),
          org.apache.spark.sql.functions.when(col("add.stats_parsed").isNotNull,
            org.apache.spark.sql.functions.to_json(col("add.stats_parsed"), Map(
              "timeZone" -> "UTC",
              "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
              "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))))
      else opt("stats", StringType)).as("stats"),
      opt("baseRowId", LongType).as("brid"),
      opt("defaultRowCommitVersion", LongType).as("drcv"),
      opt("clusteringProvider", StringType).as("clp"))
  }

  /** Driver-parsed AddFiles (a JSON v2-manifest's inline adds) lifted
    * into the same 10-column layout [[checkpointAdds]] produces, so
    * the lazy resolution path is ONE shape regardless of source.
    */
  private def addsAsResolveDf(s: SparkSession, adds: Seq[AddFile]): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, MapType, StringType, StructField}
    val schema = StructType(Seq(
      StructField("path", StringType), StructField("pv", MapType(StringType, StringType)),
      StructField("size", LongType), StructField("mtime", LongType),
      StructField("dv_st", StringType), StructField("dv_p", StringType),
      StructField("dv_off", IntegerType), StructField("dv_sz", IntegerType),
      StructField("dv_card", LongType), StructField("stats", StringType),
      StructField("brid", LongType), StructField("drcv", LongType),
      StructField("clp", StringType)))
    val rows = adds.map { a =>
      org.apache.spark.sql.Row(a.path, a.partitionValues, a.size, a.modificationTime,
        a.dv.map(_.storageType).orNull, a.dv.map(_.pathOrInlineDv).orNull,
        a.dv.flatMap(_.offset).map(Int.box).orNull,
        a.dv.map(d => Int.box(d.sizeInBytes)).orNull,
        a.dv.map(d => Long.box(d.cardinality)).orNull,
        a.stats.orNull,
        a.baseRowId.map(Long.box).orNull,
        a.defaultRowCommitVersion.map(Long.box).orNull,
        a.clusteringProvider.orNull)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
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
  /** Table history (DESCRIBE HISTORY): one row per commit JSON still
    * present in the log, newest first — (version, operation,
    * readVersion, engineInfo), from the `commitInfo` action graft's
    * writers stamp on every commit (CREATE TABLE / WRITE / DELETE /
    * UPDATE / MERGE / OPTIMIZE / RESTORE). Commits without one
    * (foreign or pre-provenance tables) surface with a null
    * operation; versions cleaned by retention are simply absent —
    * checkpoints are snapshots, not history.
    */
  def history(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hconf = s.sessionState.newHadoopConf()
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(hconf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val versions = fs.listStatus(logPath).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json")).map(_.take(20).toLong).sorted
    // `timestamp` reads off the SAME monotone series as timestampAsOf
    // and CDF's _commit_timestamp (ICT when stamped, else commit-file
    // mtime, floored by the predecessor) — DESCRIBE HISTORY, time
    // travel and the change feed must never disagree about when a
    // version happened
    val mono = commitTimestamps(fs, logPath, Long.MaxValue).toMap
    val rows = versions.flatMap { v =>
      // memoized: N DESCRIBE HISTORY calls parse each retained commit
      // once; a commit deleted between the listing and the parse
      // (racing retention) just drops from the answer
      parsedCommit(fs, logPath, v).map { cp =>
        (v, cp.operation.orNull, cp.readVersion.map(Long.box).orNull,
          cp.engineInfo.orNull, mono.get(v).map(Long.box).orNull, cp.params,
          cp.metrics)
      }
    }
    rows.sortBy(-_._1)
      .toDF("version", "operation", "readVersion", "engineInfo", "timestamp",
        "operationParameters", "operationMetrics")
  }

  /** DESCRIBE DETAIL: one row of table-level facts — format, table id,
    * location, current version, partition columns, live file count and
    * total bytes, table properties, protocol versions and feature
    * lists, and how many live files carry a deletion vector (the
    * merge-on-read debt gauge an operator sizes compaction by).
    *
    * Scale: the scalar fields are O(1) (lazy snapshot, no file
    * resolution); numFiles/sizeInBytes/numDeletionVectorFiles force
    * the gated live-file list — same cost and same
    * `maxSnapshotFiles` refusal as planning a scan, never more.
    */
  def detail(s: SparkSession, dir: String,
             versionAsOf: Option[Long] = None): DataFrame = {
    import s.implicits._
    val snap = snapshot(s, dir, versionAsOf)
    val files = snap.active
    val location = new Path(dir).getFileSystem(s.sessionState.newHadoopConf())
      .makeQualified(new Path(dir)).toUri.toString
    // name / description / createdTime ride the raw metaData node
    // (delta-spark's DESCRIBE DETAIL shape, r16); clusteringColumns
    // come from the clustering domain — LOGICAL names for the user
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val raw = snap.metaRaw.map(om.readTree)
    def str(k: String): String = raw.flatMap(n => Option(n.get(k)))
      .filterNot(_.isNull).map(_.asText()).orNull
    val createdTime: java.lang.Long = raw.flatMap(n => Option(n.get("createdTime")))
      .filterNot(_.isNull).map(n => java.lang.Long.valueOf(n.asLong())).orNull
    val physCluster = graft.sources.Clustering.columnsOf(snap)
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val logByPhys = schema.fields.map { f =>
      (if (f.metadata.contains("delta.columnMapping.physicalName"))
        f.metadata.getString("delta.columnMapping.physicalName") else f.name) -> f.name
    }.toMap
    val clusterCols = physCluster.map(c => logByPhys.getOrElse(c, c))
    Seq((
      "delta", snap.metaId.orNull, str("name"), str("description"), location,
      createdTime, snap.version,
      snap.partCols, clusterCols, files.size.toLong, files.map(_.size).sum,
      files.count(_.dv.isDefined).toLong, snap.configuration,
      snap.minReader, snap.minWriter, snap.readerFeatures, snap.writerFeatures
    )).toDF("format", "id", "name", "description", "location",
      "createdTime", "version", "partitionColumns", "clusteringColumns",
      "numFiles", "sizeInBytes", "numDeletionVectorFiles", "properties",
      "minReaderVersion", "minWriterVersion", "readerFeatures", "writerFeatures")
  }

  /** Verify a version's `.crc` checksum against a fresh replay at
    * that version — delta-spark's on-demand checksum validation.
    * Compares live file count, live bytes, the metaData facts
    * (schemaString, partitionColumns, configuration) and the protocol
    * versions. Returns true when a checksum exists and matches, false
    * when the version carries no checksum (chains seed at CREATE and
    * re-seed at checkpoints); a MISMATCH throws loudly — the
    * fingerprint of a lost commit on a non-atomic store or a
    * hand-edited log.
    *
    * Contract note: graft-authored chains cannot skew (the commit
    * funnel only removes OCC-resolved live paths, and the fold
    * refuses within-commit duplicate removes), but a FOREIGN-authored
    * `.crc` that itself mis-counted — e.g. an engine that folded an
    * idempotent re-remove of an already-removed path as -1 — would
    * make this validation throw on a healthy table until the next
    * checkpoint re-seeds the chain from the live set. Treat a
    * mismatch on a mixed-writer table as "re-checkpoint, then
    * re-validate" before concluding data loss.
    */
  def validateChecksum(s: SparkSession, dir: String,
                       versionAsOf: Option[Long] = None): Boolean = {
    val snap = snapshot(s, dir, versionAsOf)
    val log = new Path(new Path(dir), "_delta_log")
    val fs = log.getFileSystem(s.sessionState.newHadoopConf())
    val crcPath = new Path(log, f"${snap.version}%020d.crc")
    if (!fs.exists(crcPath)) return false
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // a truncated / unparseable / field-incomplete .crc (a crash
    // mid-write, a foreign shape) is NOT table corruption — it is an
    // unusable checksum, and answers false like a missing one
    val crc =
      try {
        val in = fs.open(crcPath)
        try om.readTree(in) finally in.close()
      } catch { case scala.util.control.NonFatal(_) => return false }
    if (crc == null || !crc.isObject ||
        !crc.hasNonNull("numFiles") || !crc.hasNonNull("tableSizeBytes"))
      return false
    val files = snap.active
    def fail(what: String, want: Any, got: Any): Nothing =
      throw new IllegalStateException(
        s"checksum mismatch for $dir at version ${snap.version}: $what — " +
          s"checksum says $want, replay says $got. A commit was lost or the " +
          "log was edited; do not trust this table state")
    if (crc.get("numFiles").asLong() != files.size.toLong)
      fail("numFiles", crc.get("numFiles").asLong(), files.size)
    if (crc.get("tableSizeBytes").asLong() != files.map(_.size).sum)
      fail("tableSizeBytes", crc.get("tableSizeBytes").asLong(), files.map(_.size).sum)
    val md = crc.get("metadata")
    if (md != null && md.has("schemaString") &&
        md.get("schemaString").asText() != snap.schemaJson)
      fail("metadata.schemaString", md.get("schemaString").asText(), snap.schemaJson)
    if (md != null && md.hasNonNull("partitionColumns")) {
      val pcs = (0 until md.get("partitionColumns").size())
        .map(md.get("partitionColumns").get(_).asText())
      if (pcs != snap.partCols)
        fail("metadata.partitionColumns", pcs.mkString(","), snap.partCols.mkString(","))
    }
    if (md != null && md.hasNonNull("configuration")) {
      val b = Map.newBuilder[String, String]
      val it = md.get("configuration").fields()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      val conf = b.result()
      if (conf != snap.configuration)
        fail("metadata.configuration", conf.toSeq.sorted.mkString(";"),
          snap.configuration.toSeq.sorted.mkString(";"))
    }
    val pr = crc.get("protocol")
    if (pr != null && pr.hasNonNull("minReaderVersion") &&
        (pr.get("minReaderVersion").asLong() != snap.minReader ||
          pr.get("minWriterVersion").asLong() != snap.minWriter))
      fail("protocol",
        s"(${pr.get("minReaderVersion").asLong()},${pr.get("minWriterVersion").asLong()})",
        s"(${snap.minReader},${snap.minWriter})")
    true
  }

  /** The version live at `timestampMillis` — delta-spark's
    * `timestampAsOf` rule: the NEWEST commit whose log-file
    * modification time is at or below the timestamp (commit content
    * timestamps are informational; the file system clock is the
    * protocol's time-travel authority). Refuses a timestamp older
    * than the earliest RETAINED commit (its state is not
    * reconstructible — retention cleaned it) rather than silently
    * answering with a later state.
    */
  /** One commit's `inCommitTimestamp` (leading commitInfo action),
    * None when the commit file is absent (log-compacted/cleaned) or
    * carries no stamp.
    */
  private[graft] def commitIct(fs: org.apache.hadoop.fs.FileSystem, log: Path,
                               version: Long): Option[Long] =
    parsedCommit(fs, log, version).flatMap(_.ict)

  /** The MONOTONE (version, timestampMillis) series of the retained
    * commit chain at or below `uptoVersion`: in-commit timestamps
    * (when the table stamped the commit) are authoritative — the log
    * itself carries time and survives file copies/moves that reset
    * mtime; unstamped commits fall back to the log file's mtime —
    * then floored by the predecessor's stamp, since a commit can never
    * be OLDER than its parent even when the clock ran backwards
    * (delta-spark adjusts the same way). Every timestamp consumer
    * ([[versionAtTimestamp]], CDF's `_commit_timestamp`,
    * [[readChangesTimestamp]]) reads this one series, so they can
    * never disagree; commit parses ride the [[CommitParseCache]].
    */
  private[graft] def commitTimestamps(fs: org.apache.hadoop.fs.FileSystem,
                                      logPath: Path,
                                      uptoVersion: Long): Seq[(Long, Long)] =
    fs.listStatus(logPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.matches("\\d{20}\\.json"))
      .map { st =>
        val v = st.getPath.getName.take(20).toLong
        v -> commitIct(fs, logPath, v).getOrElse(st.getModificationTime)
      }
      .filter(_._1 <= uptoVersion)
      .sortBy(_._1)
      .scanLeft((Long.MinValue, Long.MinValue)) {
        case ((_, prevTs), (v, ts)) => (v, math.max(prevTs, ts))
      }.drop(1)

  def versionAtTimestamp(s: SparkSession, dir: String, timestampMillis: Long): Long = {
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(s.sessionState.newHadoopConf())
    val mono = commitTimestamps(fs, logPath, Long.MaxValue)
    require(mono.nonEmpty, s"not a Delta table (no commits): $dir")
    require(mono.head._2 <= timestampMillis,
      s"timestamp $timestampMillis predates the earliest retained commit " +
        s"(version ${mono.head._1} at ${mono.head._2}) — that state is not " +
        "reconstructible; refusing")
    mono.takeWhile(_._2 <= timestampMillis).last._1
  }

  /** CDF by WALL CLOCK — delta-spark's `startingTimestamp` /
    * `endingTimestamp` batch semantics composed over
    * [[readChanges]]: the window is [first version stamped at or
    * after `fromMillis`, last version stamped at or before
    * `toMillis`], read off the same monotone series as
    * `timestampAsOf` and the rows' own `_commit_timestamp`. Refuses
    * loudly when the range selects nothing: a start beyond the
    * newest commit, an end before the earliest retained one, or a
    * start-after-end window — answering "empty" there would silently
    * hide changes the caller asked for.
    */
  def readChangesTimestamp(s: SparkSession, dir: String,
                           fromMillis: Long, toMillis: Long): DataFrame = {
    require(fromMillis <= toMillis,
      s"readChangesTimestamp: from $fromMillis > to $toMillis")
    val logPath = new Path(dir, "_delta_log")
    val fs = logPath.getFileSystem(s.sessionState.newHadoopConf())
    val mono = commitTimestamps(fs, logPath, Long.MaxValue)
    require(mono.nonEmpty, s"not a Delta table (no commits): $dir")
    val from = mono.find(_._2 >= fromMillis).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"readChangesTimestamp: no commit at or after $fromMillis " +
          s"(newest is version ${mono.last._1} at ${mono.last._2}); refusing " +
          "to answer an empty window as if it were history"))
    val upto = mono.takeWhile(_._2 <= toMillis)
    require(upto.nonEmpty,
      s"readChangesTimestamp: $toMillis predates the earliest retained commit " +
        s"(version ${mono.head._1} at ${mono.head._2}) — that window is not " +
        "reconstructible; refusing")
    val to = upto.last._1
    require(from <= to,
      s"readChangesTimestamp: the range [$fromMillis, $toMillis] falls between " +
        s"commits (resolved versions $from > $to) — no commit is stamped inside it")
    readChanges(s, dir, from, to)
  }

  /** Time travel by wall clock: `read` at [[versionAtTimestamp]]. */
  def readTimestamp(s: SparkSession, dir: String, timestampMillis: Long): DataFrame =
    read(s, dir, Some(versionAtTimestamp(s, dir, timestampMillis)))

  /** Predicate-filtered read with DATA SKIPPING: files whose
    * stats/partition envelope cannot satisfy `predicate` are pruned on
    * the driver WITHOUT being opened (add.stats, written from parquet
    * footers at commit time — [[DeltaStats]]), then the predicate
    * applies exactly on the distributed scan of the survivors. The
    * result equals `read(...).where(predicate)`; the difference is the
    * 100-TB cost profile: a narrow predicate on a clustered/z-ordered
    * table touches O(matching files), not O(table).
    */
  def readWhere(s: SparkSession, dir: String, predicate: String,
                versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(s, dir, versionAsOf)
    val files = DeltaStats.prune(s, snap.active, predicate, snap)
    scanFiles(s, dir, snap, files)
      .where(org.apache.spark.sql.functions.expr(predicate))
  }

  /** Highest `txn` version committed for `appId`, or -1 if none — the
    * idempotence watermark of PROTOCOL.md's transaction identifiers: a
    * streaming writer skips any batch id at or below it, so a batch
    * retried after a sink crash lands exactly once.
    */
  def lastTxnVersion(s: SparkSession, dir: String, appId: String): Long =
    snapshot(s, dir, None).txns.getOrElse(appId, -1L)

  /** Strips scheme + authority off a file URI/path string, leaving the
    * path component — `_metadata.file_path` ("file:///a/b"), binaryFile
    * `path` ("file:/a/b") and Hadoop `Path.toUri.getPath` ("/a/b") all
    * normalize to the same key, which is what the deletion-vector
    * anti-join matches on.
    */
  private val SchemeAuthorityRe = "^[a-zA-Z][a-zA-Z0-9+.\\-]*:(//[^/]*)?"

  /** Decoded path component of a file URI string. `_metadata.file_path`
    * and binaryFile `path` are URL-encoded URI strings (a space renders
    * as %20) while the log-derived join side uses Hadoop's DECODED
    * `toUri.getPath` — both keys must be the decoded form or a file
    * under a directory with a space never matches and its deleted rows
    * silently resurface. Literal '+' is protected first because
    * `url_decode` is form-decoding (it would turn '+' into a space,
    * which URI path encoding never produces). Stays in builtins so the
    * scan projection keeps whole-stage codegen.
    */
  private def uriPathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{regexp_replace, url_decode}
    url_decode(regexp_replace(regexp_replace(c, SchemeAuthorityRe, ""), "\\+", "%2B"))
  }

  /** The deleted (file, row-index) set of a snapshot as a DataFrame of
    * `__dv_path` (normalized data-file path) and `__dv_ridx` — the
    * anti-join side of a DV-carrying read. Decoding runs on EXECUTORS:
    * sidecar files ride the binaryFile source (one row per `.bin`
    * file, Hadoop conf handled by Spark), inline bitmaps ship as byte
    * rows; only the KB-scale descriptors live on the driver, so a
    * table with millions of deleted rows never materializes them
    * driver-side.
    */
  private[graft] def deletedRowsDf(s: SparkSession, root: Path,
                                   fs: org.apache.hadoop.fs.FileSystem,
                                   withDv: Seq[AddFile]): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, udf}
    def norm(p: Path): String = fs.makeQualified(p).toUri.getPath
    // (dataPath, sidecarPath|null, offset, size, cardinality, inlineBytes|null)
    val descs = withDv.map { f =>
      val d = f.dv.get
      val dataNorm = norm(resolveAddPath(root, f.path))
      d.storageType match {
        case "i" =>
          // padded to a 4-byte group boundary by the base85 encoding;
          // sizeInBytes recovers the true length
          val bytes = base85Decode(d.pathOrInlineDv)
          require(bytes.length >= d.sizeInBytes,
            s"inline deletion vector decodes to ${bytes.length} bytes < declared ${d.sizeInBytes}")
          (dataNorm, null: String, -1, d.sizeInBytes, d.cardinality, bytes.take(d.sizeInBytes))
        case "u" | "p" =>
          val off = d.offset.getOrElse(sys.error(
            s"file-backed deletionVector for ${f.path} carries no offset"))
          (dataNorm, norm(dvFilePath(root, d)), off, d.sizeInBytes, d.cardinality,
            null: Array[Byte])
        case other =>
          sys.error(s"unsupported deletionVector storageType '$other' for ${f.path} — " +
            "refusing to surface deleted rows as live data")
      }
    }
    val sliceUdf = udf { (content: Array[Byte], off: Int, sz: Int, card: Long) =>
      decodeDvFromFile(content, off, sz, card)
    }
    val inlineUdf = udf { (bytes: Array[Byte], card: Long) =>
      decodeDvBitmap(bytes, card)
    }
    import s.implicits._
    val fileDescs = descs.filter(_._2 != null)
    val fromFiles = if (fileDescs.isEmpty) None else {
      val content = s.read.format("binaryFile")
        .load(fileDescs.map(_._2).distinct: _*)
        .select(uriPathCol(col("path")).as("__dvfile"),
          col("content"))
      val descDf = fileDescs.map { case (dp, dvp, off, sz, card, _) => (dp, dvp, off, sz, card) }
        .toDF("__dv_path", "__dvfile", "off", "sz", "card")
      Some(descDf.join(content, "__dvfile")
        .select(col("__dv_path"),
          explode(sliceUdf(col("content"), col("off"), col("sz"), col("card"))).as("__dv_ridx")))
    }
    val inlineDescs = descs.filter(_._6 != null)
    val fromInline = if (inlineDescs.isEmpty) None else {
      Some(inlineDescs.map { case (dp, _, _, _, card, bytes) => (dp, bytes, card) }
        .toDF("__dv_path", "bytes", "card")
        .select(col("__dv_path"),
          explode(inlineUdf(col("bytes"), col("card"))).as("__dv_ridx")))
    }
    (fromFiles.toSeq ++ fromInline.toSeq).reduce(_ unionByName _)
  }

  def read(s: SparkSession, dir: String, versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(s, dir, versionAsOf)
    snap.synchronized {
      snap.fullScanMemo.getOrElse {
        val df = scanFiles(s, dir, snap, snap.active)
        snap.fullScanMemo = Some(df)
        df
      }
    }
  }

  /** Read a ROW-TRACKING table with its row identities: the table
    * columns plus `_row_id` (= the file's `baseRowId` + the row's
    * parquet row_index — the protocol's id derivation when no
    * materialized column exists, which graft never writes) and
    * `_row_commit_version` (the add's defaultRowCommitVersion). Stable
    * across appends, merge-on-read DV deletes and restores; a
    * copy-on-write rewrite re-identifies the rows it rewrites (the
    * non-preserving profile — see [[graft.sources.RowTracking]]).
    * The id map is one (path, baseRowId, version) row per LIVE file —
    * bounded by the already-gated snapshot list — broadcast into the
    * scan; everything else stays the shared distributed pushdown scan.
    */
  def readWithRowIds(s: SparkSession, dir: String,
                     versionAsOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    import s.implicits._
    val snap = snapshot(s, dir, versionAsOf)
    require(snap.writerFeatures.contains("rowTracking"),
      s"table at $dir does not declare the rowTracking feature — run " +
        "LakeWriter.enableRowTracking first")
    scanFilesWithRowIds(s, dir, snap, snap.active)
  }

  /** The id-carrying scan of `files`: table columns + `_row_id` +
    * `_row_commit_version` — factored from [[readWithRowIds]] so
    * id-preserving rewrites (compactDelta) can re-materialize exactly
    * what the reader would derive.
    */
  private[graft] def scanFilesWithRowIds(s: SparkSession, dir: String,
                                         snap: Snapshot,
                                         files: Seq[AddFile]): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    import s.implicits._
    files.find(_.baseRowId.isEmpty).foreach(a => throw new IllegalArgumentException(
      s"rowTracking declared but live file ${a.path} carries no baseRowId — " +
        "the enableRowTracking backfill is missing (or a restore rewound below " +
        "enablement); refusing to fabricate row identities"))
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val idMap = files.map(a =>
      (fs.makeQualified(resolveAddPath(root, a.path)).toUri.getPath,
        a.baseRowId.get, a.defaultRowCommitVersion.getOrElse(-1L)))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    // preserved profile: a file written by an id-preserving rewrite
    // (compactDelta on a tracked table) stores each row's identity in
    // the MATERIALIZED physical columns, which win over the fresh
    // baseRowId + row_index derivation; pre-rewrite files read them as
    // null and fall through to the derived form
    val mat = graft.sources.RowTracking.materializedCols(snap)
    val extraPhys = mat.toSeq.flatMap { case (idc, vc) => Seq(
      org.apache.spark.sql.types.StructField(idc, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(vc, org.apache.spark.sql.types.LongType))
    }
    val joined = scanFiles(s, dir, snap, files, keepLineage = true, extraPhys = extraPhys)
      .join(broadcast(idMap.toDF("__rt_path", "__rt_base", "__rt_ver")),
        col("__dv_path") === col("__rt_path"))
    val (idExpr, verExpr) = mat match {
      case Some((idc, vc)) =>
        (org.apache.spark.sql.functions.coalesce(col(s"`$idc`"),
          col("__rt_base") + col("__dv_ridx")),
          org.apache.spark.sql.functions.coalesce(col(s"`$vc`"), col("__rt_ver")))
      case None =>
        (col("__rt_base") + col("__dv_ridx"), col("__rt_ver"))
    }
    joined.select((schema.fieldNames.map(col) :+
      idExpr.as("_row_id") :+
      verExpr.as("_row_commit_version")).toIndexedSeq: _*)
  }

  /** Partition-pruned snapshot read: only files whose log
    * `partitionValues` carry every (key, value) in `partition` are
    * resolved, collected and scanned — on a 100-TB table the driver
    * never materializes the other partitions' file entries (pruning
    * happens inside the distributed resolution, and the
    * maxSnapshotFiles gate applies to the pruned list). Keys/values
    * are the log's string form — physical keys on a column-mapped
    * table. Equality-only by design: it must evaluate identically on
    * the driver (commit suffix) and in the resolve DataFrame, which
    * rules out arbitrary expressions.
    */
  def readPartition(s: SparkSession, dir: String, partition: Map[String, String],
                    versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(s, dir, versionAsOf)
    // validate against the declared partition columns WITHOUT forcing
    // the full file resolution (that would defeat the pruning); on a
    // column-mapped table both the logical and physical spellings of a
    // partition column are accepted, but matching is against the log's
    // physical keys, so remap logical → physical here
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val mapped = snap.configuration.getOrElse("delta.columnMapping.mode", "none") != "none"
    val physByLogical = schema.fields.filter(f => snap.partCols.contains(f.name))
      .map(f => f.name -> (if (!mapped) f.name
        else f.metadata.getString("delta.columnMapping.physicalName"))).toMap
    val physSet = physByLogical.values.toSet
    val unknown = partition.keySet.filterNot(k =>
      physByLogical.contains(k) || physSet.contains(k))
    require(unknown.isEmpty,
      s"readPartition: ${unknown.mkString(", ")} not partition columns " +
        s"(declared: ${snap.partCols.mkString(", ")})")
    val physPartition = partition.map { case (k, v) =>
      physByLogical.getOrElse(k, k) -> v
    }
    scanFiles(s, dir, snap, snap.activeMatching(physPartition))
  }

  /** The distributed scan of `files` under `snap`'s metadata — the
    * shared tail of the batch read (all active files) and the
    * streaming tail source (one version's new adds): column-mapping
    * remap, log-authoritative partition values, deletion-vector
    * anti-filter.
    */
  /** `keepLineage = true` appends `__dv_path` (normalized file path)
    * and `__dv_ridx` (row index) to the output — what the DELETE
    * writer needs to turn a predicate match back into per-file row
    * indexes. Lineage rows are post-DV-filter, so a second delete on
    * an already-vectored file only sees its LIVE rows.
    */
  /** `extraPhys`: additional PHYSICAL parquet columns to surface —
    * columns outside the logical schema (the materialized row-id
    * columns a preserving rewrite stores). Files lacking them read as
    * null, which is exactly the reader contract: null means "derive
    * from baseRowId + row_index".
    */
  private[graft] def scanFiles(s: SparkSession, dir: String,
                               snap: Snapshot, files: Seq[AddFile],
                               keepLineage: Boolean = false,
                               extraPhys: Seq[org.apache.spark.sql.types.StructField] = Nil)
      : DataFrame = {
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val cmMode = snap.configuration.getOrElse("delta.columnMapping.mode", "none")
    val mapped = cmMode != "none"
    def physName(f: org.apache.spark.sql.types.StructField): String =
      if (!mapped) f.name
      else {
        require(f.metadata.contains("delta.columnMapping.physicalName"),
          s"column mapping is '$cmMode' but field '${f.name}' carries no " +
            "delta.columnMapping.physicalName metadata — malformed schemaString")
        f.metadata.getString("delta.columnMapping.physicalName")
      }
    // id mode: the parquet FIELD IDS are authoritative, not the names
    // the files happen to carry — attach the protocol's column id as
    // parquet.field.id so Spark's readers resolve by id (the physical
    // name stays as the projection handle on our side)
    def withFieldId(f: org.apache.spark.sql.types.StructField)
        : org.apache.spark.sql.types.StructField =
      if (cmMode != "id") f
      else {
        require(f.metadata.contains("delta.columnMapping.id"),
          s"column mapping is 'id' but field '${f.name}' carries no " +
            "delta.columnMapping.id metadata — malformed schemaString")
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
          .build())
      }
    if (cmMode == "id") enableFieldIdReads(s)
    // NESTED physical names (delta-spark assigns one per level; graft's
    // own mapped tables only rename at the top): the read schema must
    // carry the files' physical names at EVERY level or nested leaves
    // silently null-fill — DeltaStats.physicalShape, the SAME walker
    // the write staging uses, so read and write schemas cannot
    // desynchronize. Inner fields are lenient (no metadata = keep the
    // name — graft's shape); a changed struct casts back to the
    // logical type on projection, which renames positionally and is a
    // value no-op (identical field types). The cast is applied ONLY
    // when a nested name actually differs, so graft-written tables
    // keep their exact previous plans (and nested pushdown).
    def physDataType(dt: DataType): DataType =
      DeltaStats.physicalShape(dt, attachIds = cmMode == "id")
    val dataFields = schema.fields.filterNot(f => snap.partCols.contains(f.name))
    val dataSchema = StructType(dataFields
      .map(f => withFieldId(f.copy(name = physName(f),
        dataType = if (mapped) physDataType(f.dataType) else f.dataType))) ++
      extraPhys.map(_.copy(nullable = true)))
    // (physical top-level name, logical name, cast-back type when the
    // nested physical shape differs from the logical one)
    val logicalByPhys = dataFields.map { f =>
      val deep = if (mapped) physDataType(f.dataType) else f.dataType
      (physName(f), f.name,
        if (deep == f.dataType) None
        // deep-nullable target: see readCdcFiles' twin above
        else Some(DeltaStats.deepNullable(f.dataType)))
    }
    val partSchema = schema.fields.filter(f => snap.partCols.contains(f.name))

    if (files.isEmpty) {
      val outSchema = StructType(schema.fields ++
        extraPhys.map(_.copy(nullable = true)) ++
        (if (!keepLineage) Nil else Seq(
          org.apache.spark.sql.types.StructField("__dv_path", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__dv_ridx", org.apache.spark.sql.types.LongType))))
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    }

    val hasDv = files.exists(_.dv.isDefined)
    val withMeta = hasDv || keepLineage
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())

    // one union branch per partition-value tuple: partition values come
    // from the LOG (authoritative per the spec), typed via schemaString
    val groups = files.groupBy(_.partitionValues)
    val unioned = groups.map { case (pv, group) =>
      // absolute URIs (shallow clones / external files) resolve as the
      // URI they are; relative entries against the table root
      val paths = group.map(f => resolveAddPath(root, f.path).toString)
      val base0 = s.read.schema(dataSchema).parquet(paths: _*)
      // ONE atomic physical→logical projection, not a rename fold: after
      // column renames/swaps on a legacy-upgraded name-mode table, one
      // field's physical name may legally equal ANOTHER field's logical
      // name, and a sequential rename would create a duplicate column
      // mid-fold and fail on a readable table
      val projection = logicalByPhys.map { case (phys, logical, castBack) =>
        val c = base0.col(s"`${phys.replace("`", "``")}`")
        castBack.fold(c)(c.cast).as(logical)
      } ++ extraPhys.map(f => base0.col(s"`${f.name.replace("`", "``")}`")) ++
        (if (!withMeta) Nil else Seq(
        // which file and which row this came from — the join key the
        // deletion-vector anti-filter matches; stays inside the
        // distributed scan (parquet's generated row_index), no UDF
        uriPathCol(base0.col("_metadata.file_path")).as("__dv_path"),
        base0.col("_metadata.row_index").as("__dv_ridx")))
      val base = base0.select(projection.toIndexedSeq: _*)
      val withParts = partSchema.foldLeft(base) { (df, f) =>
        // physical key first (what a column-mapped log writes), logical
        // as the compatibility fallback
        val raw = pv.get(physName(f)).orElse(pv.get(f.name)).orNull
        df.withColumn(f.name, lit(raw).cast(f.dataType))
      }
      withParts.select((schema.fieldNames.map(col) ++
        extraPhys.map(f => col(s"`${f.name.replace("`", "``")}`")) ++
        (if (withMeta) Seq(col("__dv_path"), col("__dv_ridx")) else Nil)).toIndexedSeq: _*)
    }.reduce(_ unionByName _)

    if (!hasDv) unioned
    else {
      // anti-join away the deleted (file, row) pairs. The deleted set's
      // size is KNOWN on the driver (descriptor cardinalities), so the
      // broadcast decision is exact, not an estimate: typical DV loads
      // (a few % of rows) broadcast; a pathological mass-delete falls
      // back to a shuffle anti-join rather than OOMing the executors.
      val dvFiles = files.filter(_.dv.isDefined)
      val deleted = deletedRowsDf(s, root, fs, dvFiles)
      // size the broadcast decision in BYTES, not rows: each deleted row
      // carries the full normalized path string + a long, so a row-count
      // cutoff alone could broadcast hundreds of MB of path copies. The
      // estimate is exact on cardinality (driver-known from descriptors)
      // and conservative on width (qualified path length + 24B of
      // long/object overhead); cap at 32 MB — past that, shuffle.
      val rootLen = root.toString.length
      val estBytes = dvFiles.map { f =>
        f.dv.get.cardinality * (f.path.length + rootLen + 24L)
      }.sum
      val joinSide =
        if (estBytes <= 32L * 1024 * 1024)
          org.apache.spark.sql.functions.broadcast(deleted)
        else deleted
      val filtered = unioned.join(joinSide, Seq("__dv_path", "__dv_ridx"), "left_anti")
      if (keepLineage) filtered
      else filtered.select((schema.fieldNames.map(col) ++
        extraPhys.map(f => col(s"`${f.name.replace("`", "``")}`"))).toIndexedSeq: _*)
    }
  }
}
