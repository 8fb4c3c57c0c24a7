package graft

import graft.sources.{DeltaReader, DeltaStats, LakeWriter}
import org.apache.spark.sql.types._

/** ALL-FEATURES-AT-ONCE foreign fixture (r17): one hand-built table
  * declaring id-mode column mapping + deletion vectors + row tracking
  * + change data feed + v2Checkpoints + checkpointProtection
  * SIMULTANEOUSLY — the shape a real delta-spark 4.x table presents,
  * where pairwise-feature coverage can still hide composition bugs.
  * Decoy parquet names at every level, an inline DV carrying a
  * baseRowId'd add, a row-id watermark in domain metadata, and then
  * the full battery: scan, row-id reads, typed pruning, CDF, graft
  * interop writes (append / DV delete / DV update / OPTIMIZE, ids
  * stable where promised), a graft-authored V2 checkpoint as the sole
  * replay base, and stream≡batch on the composed table.
  */
class DeltaForeignComboSpec extends SparkSpec {
  import spark.implicits._

  private val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

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

  private def statsJson(ids: Seq[Long]): String = om.writeValueAsString(
    s"""{"numRecords":${ids.size},"minValues":{"col-i":${ids.min},"p_s":{"p_x":${ids.min * 2},"p_tag":"t${ids.min}"}},""" +
      s""""maxValues":{"col-i":${ids.max},"p_s":{"p_x":${ids.max * 2},"p_tag":"t${ids.max}"}},""" +
      s""""nullCount":{"col-i":0,"p_s":{"p_x":0,"p_tag":0}}}""")

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

  /** Build the 2-commit everything-declared fixture. Model:
    *   v0 = ids 0..9 (fileA, baseRowId 0) + 500..509 (fileB,
    *        baseRowId 10), watermark 19
    *   v1 = v0 minus {0, 3}  (inline DV on fileA, baseRowId carried,
    *        cdc file) — row ids of survivors stay baseRowId + index
    */
  private def mkCombo(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fcombo_").toFile
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
    decoyFile(dir, "_change_data/cdc-1.parquet", Seq(row(0L), row(3L)),
      change = Some(Seq("delete", "delete")))
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping","deletionVectors","v2Checkpoints"],"writerFeatures":["columnMapping","deletionVectors","changeDataFeed","rowTracking","domainMetadata","v2Checkpoints","checkpointProtection"]}}""",
      s"""{"metaData":{"id":"fcombo","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"4","delta.enableChangeDataFeed":"true","delta.enableRowTracking":"true","delta.rowTracking.materializedRowIdColumnName":"_mat_rid","delta.rowTracking.materializedRowCommitVersionColumnName":"_mat_rcv"}}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":19}","removed":false}}""",
      s"""{"add":{"path":"fileA.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${statsJson(0L until 10L)},"baseRowId":0,"defaultRowCommitVersion":0}}""",
      s"""{"add":{"path":"fileB.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${statsJson(500L until 510L)},"baseRowId":10,"defaultRowCommitVersion":0}}"""
    ).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(log, f"${1L}%020d.json").toPath, Seq(
      """{"commitInfo":{"timestamp":2,"operation":"DELETE","operationParameters":{},"engineInfo":"foreign"}}""",
      """{"remove":{"path":"fileA.parquet","deletionTimestamp":2,"dataChange":true}}""",
      s"""{"add":{"path":"fileA.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${statsJson(0L until 10L)},${inlineDvJson(Seq(0L, 3L))},"baseRowId":0,"defaultRowCommitVersion":0}}""",
      """{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},"size":1,"dataChange":false}}"""
    ).mkString("\n").getBytes("UTF-8"))
    dir.getPath
  }

  private def state(dir: String, v: Option[Long] = None): Map[Long, (Long, String)] =
    DeltaReader.read(spark, dir, v).selectExpr("id", "s.x", "s.tag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def model(ids: Seq[Long]): Map[Long, (Long, String)] =
    ids.map(i => i -> ((i * 2, s"t$i"))).toMap

  private def rowIds(dir: String): Map[Long, Long] =
    DeltaReader.readWithRowIds(spark, dir).select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val v0Ids = (0L until 10L) ++ (500L until 510L)
  private val v1Ids = v0Ids.filterNot(i => i == 0L || i == 3L)

  test("scan + row ids + typed pruning + CDF on the all-features fixture") {
    val dir = mkCombo()
    assert(state(dir) == model(v1Ids))
    assert(state(dir, Some(0L)) == model(v0Ids))
    // row ids: fileA survivors keep baseRowId 0 + physical index (the
    // DV'd positions' ids simply never surface); fileB 500+j -> 10+j
    val ids = rowIds(dir)
    assert(ids == (v1Ids.map(i => i -> (if (i < 500) i else i - 490L)).toMap),
      ids.toString)
    // typed nested pruning over the decoy-keyed foreign stats
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).map(_.path).toSet
    assert(kept("s.x >= 1000") == Set("fileB.parquet"))
    assert(kept("id <= 5") == Set("fileA.parquet"))
    // CDF: the foreign cdc file IS the change set, decoy-named, id-resolved
    val ch = DeltaReader.readChanges(spark, dir, 1L, 1L)
    assert(ch.selectExpr("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((0L, "delete"), (3L, "delete")))
  }

  test("graft interop: append, DV delete, DV update — ids stable where promised, watermark advances") {
    val dir = mkCombo()
    // append: fresh ids above the foreign watermark (19)
    LakeWriter.appendDelta(spark.range(900, 902).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s")
      .coalesce(1), dir)
    val ids1 = rowIds(dir)
    assert(Set(900L, 901L).map(ids1) == Set(20L, 21L), ids1.toString)
    // merge-on-read DELETE composes: survivors keep ids
    LakeWriter.deleteWhereDv(spark, dir, "id = 505")
    val ids2 = rowIds(dir)
    assert(!ids2.contains(505L))
    assert(ids2 == ids1 - 505L, "DV delete must not move any surviving id")
    // merge-on-read UPDATE composes (r17): untouched rows keep ids,
    // the updated row is a NEW row with a fresh id above the watermark
    LakeWriter.updateWhereDv(spark, dir, "id = 507", Map("s" ->
      "named_struct('x', CAST(7777 AS BIGINT), 'tag', 'upd')"))
    val ids3 = rowIds(dir)
    assert((ids3 - 507L) == (ids2 - 507L), "update must not move survivors")
    assert(ids3(507L) > 21L, "updated row takes a fresh id")
    assert(DeltaReader.read(spark, dir).where("id = 507")
      .selectExpr("s.tag").head().getString(0) == "upd")
    assert(graft.sources.RowTracking.watermark(
      DeltaReader.snapshot(spark, dir, None)).get >= ids3(507L))
    // ids stay globally unique through the whole composition
    assert(ids3.values.toSeq.distinct.size == ids3.size)
  }

  test("OPTIMIZE preserves ids (materialized cols, id-mode footers); v2 checkpoint is a sole replay base") {
    val dir = mkCombo()
    LakeWriter.appendDelta(spark.range(900, 903).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s")
      .repartition(2), dir)
    val before = rowIds(dir)
    LakeWriter.compactDelta(spark, dir, minFiles = 2)
    assert(rowIds(dir) == before, "preserved profile must hold on the combo table")
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.forall(_.dv.isEmpty), "compaction folds the inline DV away")
    // compacted footers carry the PHYSICAL id-mode shape plus the
    // foreign-named materialized identity columns
    val hconf = spark.sessionState.newHadoopConf()
    val compacted = snap.active.filter(_.path.contains("part-compact"))
    assert(compacted.nonEmpty)
    compacted.foreach { a =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dir, a.path), hconf))
      val names = try {
        import scala.jdk.CollectionConverters._
        rdr.getFooter.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
      } finally rdr.close()
      assert(names.contains("_mat_rid") && names.contains("_mat_rcv"), names.toString)
      assert((names - "_mat_rid" - "_mat_rcv").forall(n =>
        n == "col-i" || n == "p_s"), names.toString)
    }
    // the declared v2Checkpoints feature obligates the V2 shape — the
    // generic author routes there; it then serves as the SOLE base
    LakeWriter.checkpointDelta(spark, dir, snap.version)
    val log = new java.io.File(dir, "_delta_log")
    assert(log.listFiles().exists(_.getName.matches(
      f"${snap.version}%020d\\.checkpoint\\..*\\.(json|parquet)")),
      "v2 manifest expected")
    (0L to snap.version).foreach { v =>
      new java.io.File(log, f"$v%020d.json").delete()
    }
    assert(rowIds(dir) == before,
      "row ids and watermark must survive the v2 checkpoint as sole replay base")
    assert(graft.sources.RowTracking.watermark(
      DeltaReader.snapshot(spark, dir, None)).isDefined)
    // pruning still works off the checkpointed stats (an out-of-range
    // predicate prunes every file — stats survived the v2 round trip)
    val snap2 = DeltaReader.snapshot(spark, dir, None)
    assert(DeltaStats.prune(spark, snap2.active, "id >= 10000", snap2).isEmpty,
      "checkpointed stats must still prune")
  }

  test("stream ≡ batch on the combo table") {
    val dir = mkCombo()
    val sq = spark.readStream.format("graft-delta").load(dir)
      .groupBy().count()
    val q = sq.writeStream.format("memory").queryName("fcombo_cnt")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("fcombo_cnt").head().getLong(0) == v1Ids.size.toLong)
  }
}
