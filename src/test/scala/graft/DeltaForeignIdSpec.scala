package graft

import graft.sources.{DeltaReader, DeltaStats, LakeWriter}
import org.apache.spark.sql.types._

/** ADVERSARIAL foreign id-mode fixture (r16): a hand-built table in the
  * shape a delta-spark CONVERT-from-Iceberg produces — decoy parquet
  * column names at EVERY nesting level whose field ids line up with the
  * log's columnMapping ids, per-level physical names in the
  * schemaString, physically-keyed nested stats, a CDF commit whose cdc
  * file carries the same decoy-named id'd shape, and an inline deletion
  * vector. The whole READ battery must resolve by field id alone:
  * scan + time travel, typed nested pruning, readChanges, the streaming
  * source, then graft interop writes, a graft-authored checkpoint
  * (stats_parsed over nested physical names) as the sole replay base,
  * and checksum validation.
  */
class DeltaForeignIdSpec extends SparkSpec {
  import spark.implicits._

  private val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  /** Decoy-named file schema: names mean nothing, ids everything. */
  private def decoySchema: StructType = {
    def md(id: Long) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    StructType(Seq(
      StructField("d_i", LongType, nullable = true, md(1)),
      StructField("d_s", StructType(Seq(
        StructField("d_x", LongType, nullable = true, md(3)),
        StructField("d_tag", StringType, nullable = true, md(4)))),
        nullable = true, md(2))))
  }

  private def cdcDecoySchema: StructType = StructType(
    decoySchema.fields :+ StructField("_change_type", StringType, nullable = true))

  /** Write `rows` (id, x, tag[, changeType]) as ONE decoy-named parquet
    * file at dir/name, field ids at every level.
    */
  private def decoyFile(dir: java.io.File, name: String,
                        rows: Seq[(Long, Long, String)],
                        change: Option[Seq[String]] = None): Unit = {
    val key = "spark.sql.parquet.fieldId.write.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val schema = if (change.isDefined) cdcDecoySchema else decoySchema
      val data = rows.zipWithIndex.map { case ((i, x, t), idx) =>
        val s = org.apache.spark.sql.Row(x, t)
        change match {
          case Some(cs) => org.apache.spark.sql.Row(i, s, cs(idx))
          case None => org.apache.spark.sql.Row(i, s)
        }
      }
      val stage = new java.io.File(dir, s"_stage_$name")
      spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
        .coalesce(1).write.parquet(stage.getPath)
      val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(dir, name)
      target.getParentFile.mkdirs()
      java.nio.file.Files.move(pf.toPath, target.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Physically-keyed nested stats for a contiguous id range. */
  private def statsJson(ids: Seq[Long]): String = om.writeValueAsString(
    s"""{"numRecords":${ids.size},"minValues":{"col-i":${ids.min},"p_s":{"p_x":${ids.min * 2},"p_tag":"t${ids.min}"}},""" +
      s""""maxValues":{"col-i":${ids.max},"p_s":{"p_x":${ids.max * 2},"p_tag":"t${ids.max}"}},""" +
      s""""nullCount":{"col-i":0,"p_s":{"p_x":0,"p_tag":0}}}""")

  /** PROTOCOL.md portable RoaringBitmapArray (DeltaDvSpec's shape). */
  private def serializeBitmap(indexes: Seq[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(1681511377))
    val byKey = indexes.groupBy(i => (i >>> 32).toInt).toSeq.sortBy(_._1)
    out.writeLong(java.lang.Long.reverseBytes(byKey.size.toLong))
    byKey.foreach { case (k, vs) =>
      out.writeInt(Integer.reverseBytes(k))
      val rb = new org.roaringbitmap.RoaringBitmap()
      vs.foreach(v => rb.add(v.toInt))
      rb.serialize(out)
    }
    out.flush()
    bos.toByteArray
  }

  private def inlineDvJson(indexes: Seq[Long]): String = {
    val data = serializeBitmap(indexes)
    val padded = if (data.length % 4 == 0) data
      else data ++ new Array[Byte]((4 - data.length % 4) % 4)
    val enc = DeltaReader.base85Encode(padded)
    s""""deletionVector":{"storageType":"i","pathOrInlineDv":"$enc","sizeInBytes":${data.length},"cardinality":${indexes.size}}"""
  }

  /** Build the 3-commit fixture; returns the table dir. Model:
    *   v0 = ids 0..9 (fileA) + 500..509 (fileB)
    *   v1 = v0 minus 500       (CDF delete: remove fileB, add fileB2, cdc)
    *   v2 = v1 minus {0, 3}    (inline DV on fileA, cdc)
    */
  private def mkFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fidx_").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    def fld(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "col-i", 1),
      fld("s", StructType(Seq(
        fld("x", LongType, "p_x", 3), fld("tag", StringType, "p_tag", 4))), "p_s", 2)))
    def row(i: Long) = (i, i * 2, s"t$i")
    decoyFile(dir, "fileA.parquet", (0L until 10L).map(row))
    decoyFile(dir, "fileB.parquet", (500L until 510L).map(row))
    decoyFile(dir, "fileB2.parquet", (501L until 510L).map(row))
    decoyFile(dir, "_change_data/cdc-1.parquet", Seq(row(500L)),
      change = Some(Seq("delete")))
    decoyFile(dir, "_change_data/cdc-2.parquet", Seq(row(0L), row(3L)),
      change = Some(Seq("delete", "delete")))
    def add(path: String, ids: Seq[Long], extra: String = "") =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${statsJson(ids)}$extra}}"""
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping","deletionVectors"],"writerFeatures":["columnMapping","deletionVectors","changeDataFeed"]}}""",
      s"""{"metaData":{"id":"fidx","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"4","delta.enableChangeDataFeed":"true"}}}""",
      add("fileA.parquet", 0L until 10L),
      add("fileB.parquet", 500L until 510L)
    ).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(log, f"${1L}%020d.json").toPath, Seq(
      """{"commitInfo":{"timestamp":2,"operation":"DELETE","operationParameters":{},"engineInfo":"foreign"}}""",
      """{"remove":{"path":"fileB.parquet","deletionTimestamp":2,"dataChange":true}}""",
      add("fileB2.parquet", 501L until 510L),
      """{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},"size":1,"dataChange":false}}"""
    ).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(log, f"${2L}%020d.json").toPath, Seq(
      """{"commitInfo":{"timestamp":3,"operation":"DELETE","operationParameters":{},"engineInfo":"foreign"}}""",
      """{"remove":{"path":"fileA.parquet","deletionTimestamp":3,"dataChange":true}}""",
      s"""{"add":{"path":"fileA.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${statsJson(0L until 10L)},${inlineDvJson(Seq(0L, 3L))}}}""",
      """{"cdc":{"path":"_change_data/cdc-2.parquet","partitionValues":{},"size":1,"dataChange":false}}"""
    ).mkString("\n").getBytes("UTF-8"))
    dir.getPath
  }

  private def state(dir: String, v: Option[Long] = None): Map[Long, (Long, String)] =
    DeltaReader.read(spark, dir, v).selectExpr("id", "s.x", "s.tag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def model(ids: Seq[Long]): Map[Long, (Long, String)] =
    ids.map(i => i -> ((i * 2, s"t$i"))).toMap

  test("scan battery: decoy names resolve by field id at every level, through CDF and DV commits") {
    val dir = mkFixture()
    assert(state(dir, Some(0L)) == model((0L until 10L) ++ (500L until 510L)))
    assert(state(dir, Some(1L)) == model((0L until 10L) ++ (501L until 510L)))
    assert(state(dir) == model((1L until 10L).filterNot(_ == 3L) ++ (501L until 510L)))
  }

  test("typed nested pruning over the physically-keyed foreign stats") {
    val dir = mkFixture()
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).map(_.path).toSet
    assert(kept("s.x >= 1000") == Set("fileB2.parquet"))
    assert(kept("s.x < 100") == Set("fileA.parquet"))
    // string envelope semantics: fileA's [t0, t9] lexicographically
    // CONTAINS "t505" — keeping it is the sound answer; a value
    // outside both envelopes prunes everything
    assert(kept("s.tag = 't505'") == Set("fileA.parquet", "fileB2.parquet"))
    assert(kept("s.tag = 'a0'") == Set.empty)
    assert(kept("s.tag >= 'u'") == Set.empty)
    assert(kept("id > 100000") == Set.empty)
    // pruned read ≡ unpruned read
    assert(DeltaReader.readWhere(spark, dir, "s.x >= 1000").count() ==
      DeltaReader.read(spark, dir).where("s.x >= 1000").count())
  }

  test("readChanges folds the foreign cdc files (decoy-named, id-resolved)") {
    val dir = mkFixture()
    val changes = DeltaReader.readChanges(spark, dir, 1L, 2L)
      .selectExpr("id", "s.x", "s.tag", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSet
    assert(changes == Set(
      (500L, 1000L, "t500", "delete", 1L),
      (0L, 0L, "t0", "delete", 2L),
      (3L, 6L, "t3", "delete", 2L)), changes.toString)
  }

  test("streaming source snapshot-reads the foreign table (stream ≡ batch)") {
    val dir = mkFixture()
    val cp = java.nio.file.Files.createTempDirectory("graft_fidx_cp_").toString
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = spark.readStream.format("graft-delta").load(dir).writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect().map(_.toSeq.toVector) }
        ()
      }
      .start()
    q.awaitTermination()
    val batch = DeltaReader.read(spark, dir).collect().map(_.toSeq.toVector)
    assert(rows.toSet == batch.toSet,
      s"stream ${rows.size} rows vs batch ${batch.length}")
  }

  test("graft interop: append, checkpoint as sole replay base (stats_parsed), checksum") {
    val dir = mkFixture()
    // a graft append in the LOGICAL shape lands id-resolved files
    LakeWriter.appendDelta(
      spark.range(900, 902).selectExpr(
        "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s")
        .coalesce(1), dir)
    val expect = model((1L until 10L).filterNot(_ == 3L) ++ (501L until 510L) ++
      Seq(900L, 901L))
    assert(state(dir) == expect)
    // checksum chain validates from the first graft commit on
    DeltaReader.validateChecksum(spark, dir, None)
    // graft-authored checkpoint over the foreign shape: nested
    // physical stats_parsed + the re-emitted inline DV
    val snap = DeltaReader.snapshot(spark, dir, None)
    LakeWriter.checkpointDelta(spark, dir, snap.version)
    // drop every commit json at or below the checkpoint: the
    // checkpoint becomes the SOLE replay base
    val log = new java.io.File(dir, "_delta_log")
    (0L to snap.version).foreach { v =>
      new java.io.File(log, f"$v%020d.json").delete()
    }
    // the snapshot cache keys on a listing fingerprint — deleting the
    // commit files invalidates it naturally
    assert(state(dir) == expect, "checkpoint must be a complete replay base")
    val snap2 = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap2.active, p, snap2).map(_.path).toSet
    // stats survived the checkpoint round-trip (physically keyed)
    assert(!kept("s.x >= 1000").contains("fileA.parquet"))
    assert(kept("s.x >= 1000").exists(_.contains("fileB2")))
  }

  test("column-mapping REMOVAL on the foreign id-mode fixture: decoy files rewrite to logical footers") {
    val dir = mkFixture()
    val before = state(dir)
    LakeWriter.removeColumnMapping(spark, dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(!snap.configuration.contains("delta.columnMapping.mode"))
    assert(state(dir) == before, "values identical through the removal")
    // every live file now carries the LOGICAL names — a plain reader
    // with no Delta layer resolves them (decoy names and ids are gone)
    val raw = spark.read.parquet(snap.active.map(a =>
      new org.apache.hadoop.fs.Path(dir, DeltaReader.percentDecode(a.path)).toString): _*)
    assert(raw.columns.toSet == Set("id", "s"), raw.columns.toSeq)
    assert(raw.selectExpr("id", "s.x", "s.tag").count() == before.size)
    // the inline DV's deleted row did not resurrect
    assert(!raw.select("id").collect().map(_.getLong(0)).contains(3L))
  }
}
