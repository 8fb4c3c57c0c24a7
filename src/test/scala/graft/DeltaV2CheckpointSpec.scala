package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, struct}

/** V2 spec checkpoints (reader feature `v2Checkpoints`): manifest +
  * sidecar replay, JSON and parquet manifest forms, refusals, and
  * coexistence preference.
  */
class DeltaV2CheckpointSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  /** Build a two-version table, write its classic checkpoint at v1,
    * then return (dir, classic checkpoint file).
    */
  private def mkTable(): (String, java.io.File) = {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_v2cp_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.checkpointDelta(spark, dir, 1L)
    (dir, new java.io.File(dir, "_delta_log/00000000000000000001.checkpoint.parquet"))
  }

  /** Split the classic checkpoint into a v2 manifest (scalars +
    * checkpointMetadata + sidecar pointer) and one sidecar holding the
    * adds; optionally delete the classic file and the commit JSONs so
    * the v2 path is the ONLY way to read.
    */
  private def toV2(dir: String, classic: java.io.File, manifestVersion: Long = 1L,
                   json: Boolean = false): Unit = {
    val log = new java.io.File(dir, "_delta_log")
    val sidecars = new java.io.File(log, "_sidecars")
    sidecars.mkdirs()
    val cp = spark.read.parquet(classic.getPath)
    // sidecar: the add entries
    val stage = new java.io.File(dir, "_v2stage")
    cp.where(col("add").isNotNull).select(col("add"))
      .coalesce(1).write.parquet(stage.getPath)
    val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(sidecars, "sc-1.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    if (!json) {
      // parquet manifest: scalar rows + checkpointMetadata + sidecar
      val scalars = cp.where(col("metaData").isNotNull || col("protocol").isNotNull)
        .select(col("metaData"), col("protocol"))
        .withColumn("checkpointMetadata",
          lit(null).cast("struct<version:bigint>"))
        .withColumn("sidecar",
          lit(null).cast("struct<path:string,sizeInBytes:bigint,modificationTime:bigint>"))
      val extra = spark.range(1).select(
        lit(null).cast(scalars.schema("metaData").dataType).as("metaData"),
        lit(null).cast(scalars.schema("protocol").dataType).as("protocol"),
        struct(lit(manifestVersion).as("version")).as("checkpointMetadata"),
        struct(lit("sc-1.parquet").as("path"), lit(1L).as("sizeInBytes"),
          lit(0L).as("modificationTime")).as("sidecar"))
      val stage2 = new java.io.File(dir, "_v2stage2")
      scalars.unionByName(extra).coalesce(1).write.parquet(stage2.getPath)
      val p2 = stage2.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(p2.toPath,
        new java.io.File(log, "00000000000000000001.checkpoint.abc-123.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage2)
    } else {
      // JSON manifest: one action per line, scalars driver-readable
      val md = cp.where(col("metaData").isNotNull)
        .select("metaData.id", "metaData.schemaString").collect()(0)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val lines = Seq(
        s"""{"checkpointMetadata":{"version":$manifestVersion}}""",
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"${md.getString(0)}","format":{"provider":"parquet","options":{}},"schemaString":${om.writeValueAsString(md.getString(1))},"partitionColumns":[],"configuration":{}}}""",
        s"""{"sidecar":{"path":"sc-1.parquet","sizeInBytes":1,"modificationTime":0}}""")
      java.nio.file.Files.write(
        new java.io.File(log, "00000000000000000001.checkpoint.json-1fx.json").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
    }
  }

  private def dropPreV2(dir: String, classic: java.io.File): Unit = {
    val log = new java.io.File(dir, "_delta_log")
    classic.delete()
    new java.io.File(log, "00000000000000000000.json").delete()
    new java.io.File(log, "00000000000000000001.json").delete()
  }

  test("parquet v2 manifest + sidecar is a complete replay base") {
    val (dir, classic) = mkTable()
    toV2(dir, classic)
    dropPreV2(dir, classic)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    // scalar consumers ride the manifest too
    assert(DeltaReader.snapshot(spark, dir, None).version == 1L)
    // and the table stays writable on top of the v2 base
    val s = spark
    import s.implicits._
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v").coalesce(1), dir)
    assert(rows(DeltaReader.read(spark, dir)) ==
      Set((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")))
  }

  test("json v2 manifest + sidecar is a complete replay base") {
    val (dir, classic) = mkTable()
    toV2(dir, classic, json = true)
    dropPreV2(dir, classic)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("classic is preferred when both forms coexist") {
    val (dir, classic) = mkTable()
    // v2 with a DANGLING sidecar pointer: if the reader chose v2 it
    // would refuse — a green read proves the classic won
    toV2(dir, classic)
    new java.io.File(dir, "_delta_log/_sidecars/sc-1.parquet").delete()
    new java.io.File(dir, "_delta_log/00000000000000000000.json").delete()
    new java.io.File(dir, "_delta_log/00000000000000000001.json").delete()
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("version mismatch and missing sidecar refuse loudly") {
    val (dir, classic) = mkTable()
    toV2(dir, classic, manifestVersion = 7L)
    dropPreV2(dir, classic)
    val e = intercept[IllegalArgumentException](DeltaReader.read(spark, dir))
    assert(e.getMessage.contains("different version"))

    val (dir2, classic2) = mkTable()
    toV2(dir2, classic2)
    dropPreV2(dir2, classic2)
    new java.io.File(dir2, "_delta_log/_sidecars/sc-1.parquet").delete()
    val e2 = intercept[IllegalArgumentException](DeltaReader.read(spark, dir2))
    assert(e2.getMessage.contains("sidecar"))
  }

  test("v2 checkpoint WRITING: graft-authored manifest + sidecars replay end to end") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_v2w_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir,
      txn = Some(("app-w", 3L)))
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.checkpointDeltaV2(spark, dir, 1L, sidecarParts = 2)
    val log = new java.io.File(dir, "_delta_log")
    assert(log.listFiles().exists(_.getName.matches(
      "\\d{20}\\.checkpoint\\.[A-Za-z0-9_-]+\\.parquet")))
    assert(new java.io.File(log, "_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    // the authored v2 checkpoint is the complete replay base
    (0L to 1L).foreach(v => new java.io.File(log, f"$v%020d.json").delete())
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    assert(DeltaReader.lastTxnVersion(spark, dir, "app-w") == 3L)
    // idempotent: a classic request at the same version is a no-op
    LakeWriter.checkpointDelta(spark, dir, 1L)
    assert(!new java.io.File(log, "00000000000000000001.checkpoint.parquet").exists())
    // and the table keeps working on top
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v").coalesce(1), dir)
    assert(rows(DeltaReader.read(spark, dir)) ==
      Set((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")))
  }

  test("auto sidecar sizing splits the live set; checkpointMetadata carries sizing tags; foreign multi-sidecar manifests replay") {
    val s = spark
    import s.implicits._
    // graft-authored AUTO split: 5 live files at 2 adds/sidecar → 3
    val dir = tmp("graft_v2auto_")
    LakeWriter.writeDelta((0L until 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(5), dir)
    spark.conf.set("spark.graft.delta.checkpoint.sidecarTargetActions", "2")
    try LakeWriter.checkpointDeltaV2(spark, dir, 0L)
    finally spark.conf.unset("spark.graft.delta.checkpoint.sidecarTargetActions")
    val log = new java.io.File(dir, "_delta_log")
    val nSidecars = new java.io.File(log, "_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nSidecars == 3, s"5 live adds / 2 per sidecar must author 3, got $nSidecars")
    // tags: sizing facts ride checkpointMetadata (a reader may ignore)
    val manifest = log.listFiles().filter(_.getName.matches(
      "\\d{20}\\.checkpoint\\.[A-Za-z0-9_-]+\\.parquet")).head
    val cm = spark.read.parquet(manifest.getPath)
      .where(col("checkpointMetadata").isNotNull)
      .select("checkpointMetadata.version", "checkpointMetadata.tags").collect()
    assert(cm.length == 1 && cm(0).getLong(0) == 0L)
    val tags = cm(0).getMap[String, String](1)
    assert(tags("numSidecars") == "3" && tags("numAddFiles") == "5", tags.toString)
    // the split checkpoint is a complete replay base
    assert(new java.io.File(log, "0" * 20 + ".json").delete())
    assert(DeltaReader.read(spark, dir).count() == 20L)
    // _last_checkpoint sizing fields cover manifest + sidecars
    locally {
      val hint = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        new java.io.File(log, "_last_checkpoint"))
      assert(hint.get("numOfAddFiles").asLong() == 5L, hint.toString)
      val expect = manifest.length() + new java.io.File(log, "_sidecars")
        .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      assert(hint.get("sizeInBytes").asLong() == expect, hint.toString)
    }

    // FOREIGN multi-sidecar manifest (tags included, a shape another
    // engine writes): adds split across TWO sidecars — the reader
    // must union them and tolerate the tags field
    val (dir2, classic) = mkTable()
    val log2 = new java.io.File(dir2, "_delta_log")
    val sidecars2 = new java.io.File(log2, "_sidecars"); sidecars2.mkdirs()
    val cp = spark.read.parquet(classic.getPath)
    val adds = cp.where(col("add").isNotNull).select(col("add"))
    Seq(0, 1).foreach { i =>
      val stage = new java.io.File(dir2, s"_v2ms_$i")
      adds.where(s"pmod(hash(add.path), 2) = $i")
        .coalesce(1).write.parquet(stage.getPath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(sidecars2, s"ms-$i.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    val scalars = cp.where(col("metaData").isNotNull || col("protocol").isNotNull)
      .select(col("metaData"), col("protocol"))
      .withColumn("checkpointMetadata",
        lit(null).cast("struct<version:bigint,tags:map<string,string>>"))
      .withColumn("sidecar",
        lit(null).cast("struct<path:string,sizeInBytes:bigint,modificationTime:bigint>"))
    val extras = spark.range(1).select(
      lit(null).cast(scalars.schema("metaData").dataType).as("metaData"),
      lit(null).cast(scalars.schema("protocol").dataType).as("protocol"),
      struct(lit(1L).as("version"),
        org.apache.spark.sql.functions.map(
          lit("flavor"), lit("FLAT"), lit("numSidecars"), lit("2")).as("tags"))
        .as("checkpointMetadata"),
      lit(null).cast(scalars.schema("sidecar").dataType).as("sidecar"))
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(0, 1).map(i =>
          org.apache.spark.sql.Row(null, null, null,
            org.apache.spark.sql.Row(s"ms-$i.parquet", 1L, 0L))), 1),
        org.apache.spark.sql.types.StructType(scalars.schema.fields)))
    val stage2 = new java.io.File(dir2, "_v2ms_m")
    scalars.unionByName(extras).coalesce(1).write.parquet(stage2.getPath)
    val p2 = stage2.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(p2.toPath,
      new java.io.File(log2, "00000000000000000001.checkpoint.ms-fx1.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage2)
    dropPreV2(dir2, classic)
    assert(rows(DeltaReader.read(spark, dir2)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("vacuum reclaims below-horizon v2 manifests and their orphaned sidecars") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_v2vac_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.checkpointDeltaV2(spark, dir, 0L)
    LakeWriter.appendDelta(Seq((1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.checkpointDeltaV2(spark, dir, 2L)
    LakeWriter.vacuumDelta(spark, dir, 2L)
    val log = new java.io.File(dir, "_delta_log")
    val manifests = log.listFiles().map(_.getName)
      .filter(_.matches("\\d{20}\\.checkpoint\\.[A-Za-z0-9_-]+\\.parquet"))
    assert(manifests.length == 1 && manifests.head.startsWith("00000000000000000002"))
    // the v0 manifest's sidecar is gone, v2's survives
    assert(new java.io.File(log, "_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("multi-part checkpoint WRITING: distributed authorship, full replay, txn survival") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_mpcp_")
    LakeWriter.writeDelta((0L until 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4), dir, txn = Some(("app-x", 7L)))
    LakeWriter.appendDelta(Seq((100L, "z")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.checkpointDelta(spark, dir, 1L, parts = 3)
    val log = new java.io.File(dir, "_delta_log")
    val mp = log.listFiles().map(_.getName)
      .filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet")).sorted
    assert(mp.length == 3 && mp.forall(_.contains("0000000003")))
    // drop the commits: the multi-part checkpoint must be the complete base
    new java.io.File(log, "00000000000000000000.json").delete()
    new java.io.File(log, "00000000000000000001.json").delete()
    val expect = ((0L until 20L).map(i => (i, s"v$i")) :+ ((100L, "z"))).toSet
    assert(rows(DeltaReader.read(spark, dir)) == expect)
    // the streaming watermark survives through the multi-part base
    assert(DeltaReader.lastTxnVersion(spark, dir, "app-x") == 7L)
    // losing a part refuses instead of replaying a partial snapshot
    new java.io.File(log, mp.head).delete()
    val e = intercept[IllegalArgumentException](DeltaReader.read(spark, dir))
    assert(e.getMessage.contains("parts"))
  }

  test("timestampAsOf resolves by commit-file mtime, monotonic, refusing the pre-history") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_tsasof_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    val log = new java.io.File(dir, "_delta_log")
    def setM(v: Long, ts: Long): Unit =
      new java.io.File(log, f"$v%020d.json").setLastModified(ts)
    setM(0L, 1000L); setM(1L, 2000L); setM(2L, 3000L)
    assert(DeltaReader.versionAtTimestamp(spark, dir, 1000L) == 0L)
    assert(DeltaReader.versionAtTimestamp(spark, dir, 2500L) == 1L)
    assert(DeltaReader.versionAtTimestamp(spark, dir, 99999L) == 2L)
    assert(rows(DeltaReader.readTimestamp(spark, dir, 2500L)) == Set((0L, "a"), (1L, "b")))
    val e = intercept[IllegalArgumentException](
      DeltaReader.versionAtTimestamp(spark, dir, 999L))
    assert(e.getMessage.contains("predates"))
    // a clock that ran BACKWARDS between commits reads monotonically
    setM(1L, 500L)
    assert(DeltaReader.versionAtTimestamp(spark, dir, 1500L) == 1L)

    // the timestamp forms of CLONE and RESTORE ride the same resolution
    val cl = tmp("graft_tsasof_cl_") + "/t"
    LakeWriter.cloneDeltaTimestamp(spark, dir, cl, 2500L)
    assert(rows(DeltaReader.read(spark, cl)) == Set((0L, "a"), (1L, "b")))
    LakeWriter.restoreDeltaTimestamp(spark, dir, 2500L)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b")))
  }

  test("a protocol declaring the v2Checkpoints reader feature is accepted") {
    val s = spark
    import s.implicits._
    val (dir, classic) = mkTable()
    // upgrade the protocol in a new commit to (3,7) with v2Checkpoints
    val log = new java.io.File(dir, "_delta_log")
    java.nio.file.Files.write(new java.io.File(log, "00000000000000000002.json").toPath,
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoints"],"writerFeatures":["v2Checkpoints"]}}""" + "\n")
        .getBytes("UTF-8"))
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
  }
}
