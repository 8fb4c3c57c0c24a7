package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame

/** SHALLOW CLONE (`LakeWriter.cloneDelta`) and DESCRIBE DETAIL
  * (`DeltaReader.detail`): zero-copy forks that stay independent
  * tables through the whole mutation lifecycle — appends, deletes,
  * compaction, checkpoints, vacuum — without ever touching the
  * source's files.
  */
class DeltaCloneSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  private def dataFilesUnder(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    val root = new java.io.File(dir)
    walk(root).map(_.getPath).filter(p => p.endsWith(".parquet") || p.endsWith(".bin"))
      .filterNot(_.contains("_delta_log")).toSet
  }

  test("clone equals the source, copies no data file, and is point-in-time") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_src_")
    val dst = tmp("graft_clone_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), src)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), src)

    val n = LakeWriter.cloneDelta(spark, src, dst)
    assert(n == 2) // two live files referenced, none copied
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    assert(dataFilesUnder(dst).isEmpty, "shallow clone must copy no data file")

    // divergence is two-way: source appends never reach the clone,
    // clone appends never reach the source
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v").coalesce(1), src)
    LakeWriter.appendDelta(Seq((9L, "z")).toDF("id", "v").coalesce(1), dst)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (1L, "b"), (2L, "c"), (9L, "z")))
    assert(rows(DeltaReader.read(spark, src)) == Set((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")))
  }

  test("clone of versionAsOf forks the historic state") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_v_src_")
    val dst = tmp("graft_clone_v_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), src)
    LakeWriter.appendDelta(Seq((1L, "b")).toDF("id", "v").coalesce(1), src)
    LakeWriter.cloneDelta(spark, src, dst, versionAsOf = Some(0L))
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a")))
  }

  test("copy-on-write delete on the clone rewrites locally; the source is untouched") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_del_src_")
    val dst = tmp("graft_clone_del_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").coalesce(1), src)
    val srcFilesBefore = dataFilesUnder(src)
    LakeWriter.cloneDelta(spark, src, dst)

    val removed = LakeWriter.deleteWhere(spark, dst, "id = 1")
    assert(removed.nonEmpty)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (2L, "c")))
    // survivors rewrote into the CLONE's directory; source bytes intact
    assert(dataFilesUnder(dst).nonEmpty)
    assert(dataFilesUnder(src) == srcFilesBefore)
    assert(rows(DeltaReader.read(spark, src)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    // clone time travel below the delete still resolves source files
    assert(rows(DeltaReader.read(spark, dst, Some(0L))) == Set((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("partitioned clone with a space in a partition value prunes and round-trips") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_part_src_")
    val dst = tmp("graft_clone_part_dst_") + "/t"
    LakeWriter.writeDelta(
      Seq((0L, "a", "west coast"), (1L, "b", "east")).toDF("id", "v", "region"),
      src, partitionBy = Seq("region"))
    LakeWriter.cloneDelta(spark, src, dst)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (1L, "b")))
    val pruned = DeltaReader.readPartition(spark, dst, Map("region" -> "west coast"))
    assert(rows(pruned) == Set((0L, "a")))
  }

  test("clone of a DV table keeps deleted rows deleted (u -> p descriptor rewrite)") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_dv_src_")
    val dst = tmp("graft_clone_dv_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").coalesce(1), src)
    LakeWriter.deleteWhereDv(spark, src, "id = 1")
    LakeWriter.cloneDelta(spark, src, dst)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (2L, "c")))
    // the clone's own DV delete writes a clone-local sidecar over the
    // absolute data path — union with the inherited source DV
    LakeWriter.deleteWhereDv(spark, dst, "id = 2")
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a")))
    assert(rows(DeltaReader.read(spark, src)) == Set((0L, "a"), (2L, "c")))
  }

  test("compaction folds absolute entries into clone-local files; checkpoint replays them") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_opt_src_")
    val dst = tmp("graft_clone_opt_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), src)
    LakeWriter.appendDelta(Seq((1L, "b")).toDF("id", "v").coalesce(1), src)
    LakeWriter.cloneDelta(spark, src, dst)

    // checkpoint BEFORE compaction: absolute add.path survives the
    // checkpoint parquet and replays
    LakeWriter.checkpointDelta(spark, dst, 0L)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (1L, "b")))

    LakeWriter.compactDelta(spark, dst, minFiles = 2)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a"), (1L, "b")))
    // the folded file is clone-local; the absolute entries are tombstoned
    val snap = DeltaReader.snapshot(spark, dst, None)
    assert(snap.active.size == 1)
    assert(!snap.active.head.path.contains("://"))
  }

  test("vacuum on the clone reclaims only clone-local debris, never source files") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_vac_src_")
    val dst = tmp("graft_clone_vac_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), src)
    val srcFiles = dataFilesUnder(src)
    LakeWriter.cloneDelta(spark, src, dst)
    // local mutation creates local files + tombstones the absolute entry
    LakeWriter.deleteWhere(spark, dst, "id = 1")
    val localLive = dataFilesUnder(dst)
    val deleted = LakeWriter.vacuumDelta(spark, dst, 1L)
    assert(dataFilesUnder(src) == srcFiles, "vacuum crossed the clone boundary")
    assert(dataFilesUnder(dst) == localLive, "vacuum deleted a live clone file")
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a")))
    assert(deleted.forall(p => !p.contains("://")))
  }

  test("clone of a clone keeps the ORIGIN's URIs; cloning onto a table refuses") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone2_src_")
    val mid = tmp("graft_clone2_mid_") + "/t"
    val dst = tmp("graft_clone2_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), src)
    LakeWriter.cloneDelta(spark, src, mid)
    LakeWriter.cloneDelta(spark, mid, dst)
    assert(rows(DeltaReader.read(spark, dst)) == Set((0L, "a")))
    val snap = DeltaReader.snapshot(spark, dst, None)
    val srcUri = new org.apache.hadoop.fs.Path(src).getFileSystem(
      spark.sessionState.newHadoopConf()).makeQualified(
      new org.apache.hadoop.fs.Path(src)).toUri.toString
    assert(snap.active.forall(_.path.startsWith(srcUri)),
      s"second-level clone must reference the origin, got ${snap.active.map(_.path)}")
    val e = intercept[IllegalArgumentException] {
      LakeWriter.cloneDelta(spark, src, mid)
    }
    assert(e.getMessage.contains("already holds a Delta log"))
  }

  test("detail reports id/version/files/bytes/DV debt and clone ids differ from source") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_detail_src_")
    val dst = tmp("graft_detail_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), src,
      partitionBy = Nil)
    LakeWriter.deleteWhereDv(spark, src, "id = 1")
    val d = DeltaReader.detail(spark, src).collect()(0)
    assert(d.getAs[String]("format") == "delta")
    assert(d.getAs[Long]("version") == 1L)
    assert(d.getAs[Long]("numFiles") == 1L)
    assert(d.getAs[Long]("numDeletionVectorFiles") == 1L)
    assert(d.getAs[Long]("sizeInBytes") > 0L)
    assert(d.getAs[Long]("minReaderVersion") == 3L) // DV table upgraded
    // delta-spark's detail shape (r16): name/description null on a
    // plain table, clusteringColumns empty until CLUSTER BY
    assert(d.getAs[String]("name") == null && d.getAs[String]("description") == null)
    assert(d.getAs[scala.collection.Seq[String]]("clusteringColumns").isEmpty)
    LakeWriter.clusterBy(spark, src, Seq("id"))
    assert(DeltaReader.detail(spark, src).collect()(0)
      .getAs[scala.collection.Seq[String]]("clusteringColumns").toSeq == Seq("id"))
    LakeWriter.cloneDelta(spark, src, dst)
    val dc = DeltaReader.detail(spark, dst).collect()(0)
    assert(dc.getAs[String]("id") != d.getAs[String]("id"),
      "clone must carry its own table id")
    assert(dc.getAs[Long]("numFiles") == 1L)
    assert(dc.getAs[Long]("numDeletionVectorFiles") == 1L)
  }

  test("clone of a checkpoint-protected table reads: the boundary is version-anchored and does not carry") {
    val src = tmp("graft_clone_cp_src_") + "/t"
    val dst = tmp("graft_clone_cp_dst_") + "/t"
    LakeWriter.writeDelta(spark.range(0, 30).toDF("id").repartition(2), src,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    LakeWriter.deleteWhereDv(spark, src, "id = 3")
    LakeWriter.reorgPurge(spark, src)
    LakeWriter.dropFeature(spark, src, "deletionVectors", truncateHistory = true)
    val srcSnap = DeltaReader.snapshot(spark, src, None)
    assert(srcSnap.configuration.contains(
      "delta.requireCheckpointProtectionBeforeVersion"), "harness: source unprotected")
    LakeWriter.cloneDelta(spark, src, dst)
    // the clone's log begins at a complete version-0 snapshot — none of
    // the source's protected history exists in it, so the SOURCE-version
    // boundary must not carry (it would refuse every read of the clone)
    assert(DeltaReader.read(spark, dst).count() == 29)
    val cSnap = DeltaReader.snapshot(spark, dst, None)
    assert(!cSnap.configuration.contains(
      "delta.requireCheckpointProtectionBeforeVersion"),
      s"boundary carried into the clone: ${cSnap.configuration}")
    // the declared feature itself is an inert obligation and stays
    assert(cSnap.writerFeatures.contains("checkpointProtection"),
      cSnap.writerFeatures.toString)
    // the clone checkpoints at its own version 0 (the >=10k-file clone
    // path does exactly this) and mutates freely
    LakeWriter.checkpointDelta(spark, dst, 0L)
    LakeWriter.appendDelta(spark.range(100, 102).toDF("id"), dst)
    assert(DeltaReader.read(spark, dst).count() == 31)
  }

  test("clone of a mid-life ICT table: enablement provenance resets; clone stamps stay monotone") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_clone_ict_src_") + "/t"
    val dst = tmp("graft_clone_ict_dst_") + "/t"
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v"), src)       // v0 unstamped
    LakeWriter.alterProperties(spark, src,
      Map("delta.enableInCommitTimestamps" -> "true"))               // v1 enables
    LakeWriter.appendDelta(Seq((1L, "b")).toDF("id", "v"), src)      // v2
    Thread.sleep(5) // source enablement stamp strictly in the clone's past
    LakeWriter.cloneDelta(spark, src, dst)
    val cSnap = DeltaReader.snapshot(spark, dst, None)
    // the feature and its enabling flag carry; the SOURCE-version
    // provenance pair does not — the clone's ICT history starts at its
    // own version 0, and a carried (version=1, timestamp=T_src) would
    // alias onto the clone's commit 1 and stamp it with a stale T_src,
    // breaking the protocol's strict monotonicity
    assert(cSnap.configuration.get("delta.enableInCommitTimestamps").contains("true"))
    assert(!cSnap.configuration.contains("delta.inCommitTimestampEnablementVersion") &&
      !cSnap.configuration.contains("delta.inCommitTimestampEnablementTimestamp"),
      s"enablement provenance carried into the clone: ${cSnap.configuration}")
    // drive the clone past the source's enablement version
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v"), dst)      // clone v1
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v"), dst)      // clone v2
    val log = new org.apache.hadoop.fs.Path(dst, "_delta_log")
    val fs = log.getFileSystem(spark.sessionState.newHadoopConf())
    val stamps = (0L to 2L).map(v => DeltaReader.commitIct(fs, log, v).getOrElse(
      fail(s"clone commit $v carries no inCommitTimestamp")))
    assert(stamps == stamps.sorted && stamps.distinct == stamps,
      s"clone ICT stamps not strictly monotone: $stamps")
  }
}
