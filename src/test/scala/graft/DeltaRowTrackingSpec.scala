package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row tracking: fresh-id assignment + watermark discipline across the
  * whole mutation surface, id stability where the protocol promises it
  * (appends, DV deletes, restore, clone, checkpoint replay), honest
  * re-identification where graft's non-preserving profile rewrites,
  * and loud refusals everywhere else.
  */
class DeltaRowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rt_$tag").resolve("t")
      .toAbsolutePath.toString

  private def base: DataFrame =
    (0 until 40).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "k")

  private def rows(dir: String): Map[Long, (Long, Long)] =
    DeltaReader.readWithRowIds(spark, dir).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("_row_id"), r.getAs[Long]("_row_commit_version"))).toMap

  private def wmOf(dir: String): Long =
    graft.sources.RowTracking.watermark(
      DeltaReader.snapshot(spark, dir, None)).get

  test("enable + backfill: contiguous ids, watermark, protocol, idempotence") {
    val d = freshDir("en")
    LakeWriter.writeDelta(base.repartition(3), d)
    LakeWriter.enableRowTracking(spark, d)
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(snap.minWriter == 7)
    assert(snap.writerFeatures.contains("rowTracking") &&
      snap.writerFeatures.contains("domainMetadata"))
    assert(snap.configuration.get("delta.enableRowTracking").contains("true"))
    val ids = rows(d).values.map(_._1).toSeq.sorted
    assert(ids == (0L until 40L), s"backfill must cover 0..39: $ids")
    assert(wmOf(d) == 39L)
    val v = snap.version
    LakeWriter.enableRowTracking(spark, d) // idempotent
    assert(DeltaReader.snapshot(spark, d, None).version == v)
  }

  test("append assigns fresh ids above the watermark; old ids stable") {
    val d = freshDir("ap")
    LakeWriter.writeDelta(base, d)
    LakeWriter.enableRowTracking(spark, d)
    val before = rows(d)
    LakeWriter.appendDelta(
      (100 until 110).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "k"), d)
    val after = rows(d)
    assert(before.forall { case (k, v) => after(k) == v }, "existing ids must not move")
    val fresh = after.filterKeys(_ >= 100).values.map(_._1).toSeq.sorted
    assert(fresh == (40L until 50L), s"fresh ids must extend the sequence: $fresh")
    assert(wmOf(d) == 49L)
    assert(after.values.map(_._1).toSeq.distinct.size == after.size, "ids unique")
  }

  test("DV delete keeps survivor ids; COW delete re-identifies only rewritten files") {
    val d = freshDir("dv")
    LakeWriter.writeDelta(base.repartition(2), d)
    LakeWriter.enableRowTracking(spark, d)
    val before = rows(d)
    LakeWriter.deleteWhereDv(spark, d, "id % 4 = 0")
    val afterDv = rows(d)
    assert(afterDv.size == 30)
    assert(afterDv.forall { case (k, v) => before(k) == v },
      "a merge-on-read delete must not re-identify any surviving row")
    // copy-on-write delete: survivors of rewritten files get FRESH ids
    val wm0 = wmOf(d)
    LakeWriter.deleteWhere(spark, d, "id % 4 = 1")
    val afterCow = rows(d)
    assert(afterCow.size == 20)
    assert(afterCow.values.map(_._1).toSeq.distinct.size == 20)
    assert(afterCow.values.forall(_._1 <= wmOf(d)))
    assert(wmOf(d) > wm0, "rewrite consumed fresh ids")
  }

  test("update/merge re-identify rewrites; merge inserts get fresh ids") {
    val d = freshDir("um")
    LakeWriter.writeDelta(base.repartition(2), d)
    LakeWriter.enableRowTracking(spark, d)
    LakeWriter.updateWhere(spark, d, "id < 5", Map("v" -> "'upd'"))
    val afterUpd = rows(d)
    assert(afterUpd.size == 40)
    assert(afterUpd.values.map(_._1).toSeq.distinct.size == 40, "ids stay unique")
    val wm1 = wmOf(d)
    LakeWriter.mergeInto(spark, d,
      Seq((3L, "merged", 9), (200L, "new", 9)).toDF("id", "v", "k"), Seq("id"))
    val afterMerge = rows(d)
    assert(afterMerge.size == 41)
    assert(afterMerge.values.map(_._1).toSeq.distinct.size == 41)
    assert(afterMerge(200L)._1 > wm1, "insert must consume a fresh id")
  }

  test("ids and watermark survive the checkpoint as replay base") {
    val d = freshDir("cp")
    LakeWriter.writeDelta(base.repartition(2), d)
    LakeWriter.enableRowTracking(spark, d)
    LakeWriter.appendDelta(Seq((500L, "x", 0)).toDF("id", "v", "k"), d)
    val before = rows(d)
    val snap = DeltaReader.snapshot(spark, d, None)
    LakeWriter.checkpointDelta(spark, d, snap.version)
    // force the checkpoint to be the base: the snapshot at the same
    // version now replays from the parquet checkpoint
    val after = rows(d)
    assert(after == before, "checkpoint replay must preserve row identities")
    assert(wmOf(d) == 40L)
    LakeWriter.appendDelta(Seq((501L, "y", 0)).toDF("id", "v", "k"), d)
    assert(rows(d)(501L)._1 == 41L,
      "watermark must survive checkpointing (domainMetadata in the checkpoint)")
  }

  test("restore and clone carry identities; clone appends extend, not reuse") {
    val d = freshDir("rc")
    LakeWriter.writeDelta(base.repartition(2), d)
    LakeWriter.enableRowTracking(spark, d)
    val v1 = DeltaReader.snapshot(spark, d, None).version
    val before = rows(d)
    LakeWriter.appendDelta(Seq((300L, "x", 0)).toDF("id", "v", "k"), d)
    LakeWriter.restoreDelta(spark, d, v1)
    assert(rows(d) == before, "restore must reproduce the historic identities")
    val c = freshDir("cl")
    LakeWriter.cloneDelta(spark, d, c)
    assert(rows(c) == before, "a shallow clone shares its source's identities")
    LakeWriter.appendDelta(Seq((400L, "z", 1)).toDF("id", "v", "k"), c)
    val cloneRows = rows(c)
    // the source's watermark is 40 (the restored-away append consumed
    // id 40 and a watermark never rewinds — ids are never reused, even
    // for rows history dropped); the clone inherits it
    assert(cloneRows(400L)._1 == 41L,
      "the clone's watermark must carry — a reused id would collide with cloned rows")
    assert(cloneRows.values.map(_._1).toSeq.distinct.size == cloneRows.size)
  }

  test("compaction preserves every surviving row's id (preserved profile)") {
    val d = freshDir("pp")
    LakeWriter.writeDelta(base.repartition(4), d)
    LakeWriter.enableRowTracking(spark, d)
    // id-stable DV delete, then an append (fresh ids) — a mixed table
    LakeWriter.deleteWhereDv(spark, d, "id % 5 = 0")
    LakeWriter.appendDelta(base.limit(3).selectExpr("id + 500 AS id", "v", "k")
      .repartition(2), d)
    def idMap() = DeltaReader.readWithRowIds(spark, d)
      .select("_row_id", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = idMap()
    val filesBefore = DeltaReader.snapshot(spark, d, None).active.size
    LakeWriter.compactDelta(spark, d, minFiles = 2)
    val after = idMap()
    assert(after == before,
      "compaction must preserve _row_id for every surviving row")
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(snap.active.size < filesBefore, "compaction must reduce file count")
    assert(snap.active.forall(_.dv.isEmpty), "compaction folds DVs away")
    // a SECOND compaction round-trips the materialized columns (the
    // rewrite must read materialized ids, not re-derive from base+idx)
    LakeWriter.appendDelta(base.limit(2).selectExpr("id + 600 AS id", "v", "k"), d)
    val mid = idMap()
    LakeWriter.compactDelta(spark, d, minFiles = 2)
    assert(idMap() == mid, "re-compaction must keep preserved ids stable")
    // ids stay unique and the watermark bounds them
    val wm = graft.sources.RowTracking.watermark(snap).get
    assert(after.keySet.size == after.size && after.keySet.forall(_ <= wm))
  }

  test("compaction composes row tracking with COLUMN MAPPING: ids preserved, physical footers") {
    val d = freshDir("cm")
    LakeWriter.writeDeltaMapped(base.repartition(4), d)
    LakeWriter.enableRowTracking(spark, d)
    // mixed debt: an id-stable DV delete + a fresh append
    LakeWriter.deleteWhereDv(spark, d, "id % 5 = 0")
    LakeWriter.appendDelta(base.limit(3).selectExpr("id + 500 AS id", "v", "k")
      .repartition(2), d)
    def idMap() = DeltaReader.readWithRowIds(spark, d)
      .select("_row_id", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = idMap()
    val filesBefore = DeltaReader.snapshot(spark, d, None).active.size
    LakeWriter.compactDelta(spark, d, minFiles = 2)
    assert(idMap() == before,
      "rt+CM compaction must preserve _row_id for every surviving row")
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(snap.active.size < filesBefore)
    assert(snap.active.forall(_.dv.isEmpty), "compaction folds DVs away")
    assert(snap.active.forall(_.baseRowId.isDefined),
      "every compacted add still carries a baseRowId")
    // compacted footers: table columns under PHYSICAL names, the
    // materialized identity columns pass through by their storage names
    val hconf = spark.sessionState.newHadoopConf()
    val compacted = snap.active.filter(_.path.contains("part-compact"))
    assert(compacted.nonEmpty)
    compacted.foreach { a =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(d, a.path), hconf))
      val names = try {
        import scala.jdk.CollectionConverters._
        rdr.getFooter.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
      } finally rdr.close()
      assert(names.contains(graft.sources.RowTracking.DefaultRowIdCol),
        s"${a.path}: $names")
      val tableCols = names - graft.sources.RowTracking.DefaultRowIdCol -
        graft.sources.RowTracking.DefaultRowVerCol
      assert(tableCols.nonEmpty && tableCols.forall(_.startsWith("col-")),
        s"${a.path}: $names")
    }
    // rows themselves unchanged, and a SECOND compaction round-trips
    // the materialized ids through the CM read path
    assert(DeltaReader.read(spark, d).select("id").collect().map(_.getLong(0)).sorted
      .toSeq == before.values.toSeq.sorted)
    LakeWriter.appendDelta(base.limit(2).selectExpr("id + 600 AS id", "v", "k"), d)
    val mid = idMap()
    LakeWriter.compactDelta(spark, d, minFiles = 2)
    assert(idMap() == mid, "re-compaction must keep preserved ids stable")
  }

  test("DV update + DV CDC apply compose: survivors keep ids, changed rows fresh (CM table)") {
    val d = freshDir("udv")
    LakeWriter.writeDeltaMapped(base.repartition(2), d)
    LakeWriter.enableRowTracking(spark, d)
    val before = rows(d)
    val wm0 = wmOf(d)
    // merge-on-read UPDATE: victims become NEW rows (non-preserving
    // profile, like updateWhere's rewrite); everyone else is untouched
    // IN PLACE — the id-stability DV mutations exist for
    LakeWriter.updateWhereDv(spark, d, "id < 5", Map("v" -> "'udv'"))
    val afterUpd = rows(d)
    assert(afterUpd.size == 40)
    assert(afterUpd.filter(_._1 >= 5).forall { case (k, v) => before(k) == v },
      "rows the update didn't touch must keep their ids")
    assert(afterUpd.filter(_._1 < 5).values.forall(_._1 > wm0),
      "updated rows are NEW rows — fresh ids above the old watermark")
    assert(wmOf(d) == wm0 + 5, "watermark advances by exactly the staged rows")
    assert(afterUpd.values.map(_._1).toSeq.distinct.size == 40, "ids unique")
    assert(DeltaReader.read(spark, d).where("id < 5").select("v").collect()
      .forall(_.getString(0) == "udv"))
    // merge-on-read CDC APPLY: one batch deletes, updates and inserts
    val wm1 = wmOf(d)
    val batch = Seq((7L, "cdc", 1, "update"), (8L, "x", 0, "delete"),
      (900L, "ins", 2, "insert")).toDF("id", "v", "k", "_change_type")
    LakeWriter.applyCdcDv(spark, d, batch, Seq("id"))
    val afterCdc = rows(d)
    assert(afterCdc.size == 40, "40 - 1 delete + 1 insert")
    assert(!afterCdc.contains(8L))
    assert(afterCdc.filter(k => k._1 != 7L && k._1 != 900L)
      .forall { case (k, v) => afterUpd(k) == v },
      "rows the batch didn't touch must keep their ids")
    assert(afterCdc(7L)._1 > wm1 && afterCdc(900L)._1 > wm1,
      "the updated version and the insert both consume fresh ids")
    assert(wmOf(d) == wm1 + 2)
    assert(afterCdc.values.map(_._1).toSeq.distinct.size == 40)
    // the checksum chain stayed green through both DV mutations
    val v = DeltaReader.snapshot(spark, d, None).version
    (0L to v).foreach { ver =>
      assert(DeltaReader.validateChecksum(spark, d, Some(ver)), s"version $ver")
    }
  }

  test("z-order preserves ids on ready tables; half-enabled tables refuse loudly") {
    val d = freshDir("rf")
    LakeWriter.writeDelta(base.repartition(3), d)
    LakeWriter.enableRowTracking(spark, d)
    val before = DeltaReader.readWithRowIds(spark, d).select("_row_id", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    LakeWriter.compactDeltaZOrder(spark, d, "id", "k", filesPerPartition = 2)
    val after = DeltaReader.readWithRowIds(spark, d).select("_row_id", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "z-order must preserve every surviving row's id")
    // feature declared but no backfill/watermark (the foreign
    // half-enabled shape): writes and id reads both refuse, naming it
    val d2 = freshDir("hf")
    LakeWriter.writeDelta(base, d2)
    LakeWriter.upgradeProtocol(spark, d2, 1, 7,
      writerFeatures = Seq("rowTracking", "domainMetadata"))
    val e3 = intercept[IllegalArgumentException](
      LakeWriter.appendDelta(Seq((1L, "a", 0)).toDF("id", "v", "k"), d2))
    assert(e3.getMessage.contains("rowTracking"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      DeltaReader.readWithRowIds(spark, d2))
    assert(e4.getMessage.contains("baseRowId"), e4.getMessage)
    // and a plain table has nothing to expose
    val d3 = freshDir("pl")
    LakeWriter.writeDelta(base, d3)
    val e5 = intercept[IllegalArgumentException](
      DeltaReader.readWithRowIds(spark, d3))
    assert(e5.getMessage.contains("rowTracking"))
  }

  test("fuzz: random mutation sequences never break id uniqueness or the watermark bound") {
    val d = freshDir("fz")
    LakeWriter.writeDelta(base.repartition(2), d)
    LakeWriter.enableRowTracking(spark, d)
    val rnd = new scala.util.Random(4242)
    var nextKey = 1000L
    (1 to 12).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => LakeWriter.appendDelta(
          (0 until 5).map(i => { nextKey += 1; (nextKey, s"a$i", i % 4) })
            .toDF("id", "v", "k"), d)
        case 1 => LakeWriter.deleteWhere(spark, d, s"id % 11 = ${rnd.nextInt(11)}")
        case 2 => LakeWriter.deleteWhereDv(spark, d, s"id % 13 = ${rnd.nextInt(13)}")
        case 3 => LakeWriter.updateWhere(spark, d, s"id % 7 = ${rnd.nextInt(7)}",
          Map("v" -> s"'u$step'"))
        case 4 => LakeWriter.mergeInto(spark, d,
          { nextKey += 1; Seq((nextKey, "m", 0), (3L, s"m$step", 1)) }
            .toDF("id", "v", "k"), Seq("id"))
        case 5 =>
          val snap = DeltaReader.snapshot(spark, d, None)
          LakeWriter.checkpointDelta(spark, d, snap.version)
        case 6 => LakeWriter.updateWhereDv(spark, d,
          s"id % 9 = ${rnd.nextInt(9)}", Map("v" -> s"'dv$step'"))
      }
      val ids = DeltaReader.readWithRowIds(spark, d)
        .select("_row_id").collect().map(_.getLong(0))
      assert(ids.distinct.length == ids.length,
        s"step $step: duplicate row ids after a mutation")
      if (ids.nonEmpty) assert(ids.max <= wmOf(d),
        s"step $step: id ${ids.max} above watermark ${wmOf(d)}")
    }
  }

  test("generic domain metadata: set/remove, checkpoint survival, system-domain guard") {
    val d = freshDir("dm")
    LakeWriter.writeDelta(base, d)
    // needs the feature declared first
    val e0 = intercept[IllegalArgumentException](
      LakeWriter.setDomainMetadata(spark, d, "myapp.cluster", """{"k":1}"""))
    assert(e0.getMessage.contains("domainMetadata"))
    LakeWriter.upgradeProtocol(spark, d, 1, 7,
      writerFeatures = Seq("domainMetadata"))
    LakeWriter.setDomainMetadata(spark, d, "myapp.cluster", """{"k":1}""")
    LakeWriter.setDomainMetadata(spark, d, "myapp.other", """{"x":2}""")
    LakeWriter.setDomainMetadata(spark, d, "myapp.cluster", """{"k":9}""") // lww
    def domains = DeltaReader.snapshot(spark, d, None).domainMetadata
    assert(domains == Map("myapp.cluster" -> """{"k":9}""", "myapp.other" -> """{"x":2}"""))
    // survives the checkpoint as replay base
    val v = DeltaReader.snapshot(spark, d, None).version
    LakeWriter.checkpointDelta(spark, d, v)
    assert(domains == Map("myapp.cluster" -> """{"k":9}""", "myapp.other" -> """{"x":2}"""))
    // removal deletes the domain
    LakeWriter.setDomainMetadata(spark, d, "myapp.other", "", removed = true)
    assert(domains == Map("myapp.cluster" -> """{"k":9}"""))
    // system domains are owned by their operations
    val e1 = intercept[IllegalArgumentException](
      LakeWriter.setDomainMetadata(spark, d, "delta.rowTracking", "{}"))
    assert(e1.getMessage.contains("system-owned"))
  }
}
