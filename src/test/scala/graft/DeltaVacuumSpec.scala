package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class DeltaVacuumSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))
  private val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  private def metaLine =
    s"""{"metaData":{"id":"vac1","format":{"provider":"parquet","options":{}},"schemaString":${
      om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}"""

  private def mkTable(): (java.io.File, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_vac_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    (dir, log)
  }

  private def commit(log: java.io.File, version: Long, lines: Seq[String]): Unit =
    java.nio.file.Files.write(new java.io.File(log, f"$version%020d.json").toPath,
      lines.mkString("\n").getBytes("UTF-8"))

  private def part(dir: java.io.File, name: String, rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val stage = new java.io.File(dir, s"_stage_$name")
    rows.toDF("id", "v").coalesce(1).write.parquet(stage.getPath)
    val f = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath, new java.io.File(dir, name).toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    name
  }

  private def add(p: String) =
    s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
  private def remove(p: String) =
    s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":false}}"""

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("vacuum deletes pre-horizon tombstones and debris, keeps the live table byte-identical") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a")))
    val f1 = part(dir, "part-0001.parquet", Seq((1L, "b")))
    val fc = part(dir, "part-compact.parquet", Seq((0L, "a"), (1L, "b")))
    val f2 = part(dir, "part-0002.parquet", Seq((2L, "c")))
    // an orphan no commit ever referenced (failed-writer debris) and a
    // staging dir a racing writer is mid-flight on
    part(dir, "orphan.parquet", Seq((9L, "x")))
    val stage = new java.io.File(dir, "_stage_99")
    stage.mkdirs()
    java.nio.file.Files.write(new java.io.File(stage, "part-x.parquet").toPath, Array[Byte](1))
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine, add(f0)))
    commit(log, 1, Seq(add(f1)))
    commit(log, 2, Seq(add(fc), remove(f0), remove(f1))) // the compaction shape
    commit(log, 3, Seq(add(f2)))
    val before = rows(DeltaReader.read(spark, dir.getPath))
    assert(before == Set((0L, "a"), (1L, "b"), (2L, "c")))

    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 2L)
    assert(deleted.toSet == Set(f0, f1, "orphan.parquet"), deleted.mkString(", "))
    assert(!new java.io.File(dir, f0).exists() && !new java.io.File(dir, f1).exists())
    assert(new java.io.File(dir, fc).exists() && new java.io.File(dir, f2).exists())
    assert(new java.io.File(stage, "part-x.parquet").exists(),
      "vacuum must not touch staging directories")
    // live reads are unchanged, at latest AND at every surviving version
    assert(rows(DeltaReader.read(spark, dir.getPath)) == before)
    assert(rows(DeltaReader.read(spark, dir.getPath, Some(2L))) == Set((0L, "a"), (1L, "b")))
    // time travel below the horizon refuses loudly (not FileNotFound)
    val e = intercept[IllegalArgumentException] {
      DeltaReader.read(spark, dir.getPath, Some(1L))
    }
    assert(e.getMessage.contains("not present") || e.getMessage.contains("partial snapshot"),
      e.getMessage)
    // an append after vacuum continues the version chain
    val s = spark
    import s.implicits._
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v"), dir.getPath)
    assert(rows(DeltaReader.read(spark, dir.getPath)) == before + ((3L, "d")))
  }

  test("a file tombstoned then added back by a later commit survives vacuum") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a")))
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine, add(f0)))
    commit(log, 1, Seq(remove(f0)))
    commit(log, 2, Seq(add(f0))) // added back — RESTORE-style commit
    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 2L)
    assert(deleted.isEmpty, deleted.mkString(", "))
    assert(new java.io.File(dir, f0).exists())
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a")))
  }

  test("distributed reclaim: partitioned table with debris in partition dirs, DRY RUN first") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac_part_").toFile.getPath
    val df = (0L until 40L).map(i => (i, s"p${i % 4}")).toDF("id", "p")
    LakeWriter.writeDelta(df, dir, partitionBy = Seq("p"))
    // a rewrite creates pre-horizon tombstones inside every partition dir
    LakeWriter.compactDelta(spark, dir)
    // failed-writer debris inside two partition subtrees
    Seq("p=p0", "p=p3").foreach { pd =>
      java.nio.file.Files.write(
        new java.io.File(new java.io.File(dir, pd), "debris.parquet").toPath,
        Array[Byte](1, 2, 3))
    }
    val before = DeltaReader.read(spark, dir).select("id").as[Long].collect().toSet
    assert(before == (0L until 40L).toSet)
    // DRY RUN names the candidates and touches nothing
    val planned = LakeWriter.vacuumDelta(spark, dir, horizonVersion = 1L, dryRun = true)
    assert(planned.count(_.endsWith("debris.parquet")) == 2, planned.mkString(", "))
    assert(planned.size > 2, "the compaction's tombstoned originals must be candidates too")
    planned.foreach(rel => assert(new java.io.File(dir, rel).exists(),
      s"DRY RUN must not delete $rel"))
    // the real pass deletes exactly the planned set, across partition subtrees
    val deleted = LakeWriter.vacuumDelta(spark, dir, horizonVersion = 1L)
    assert(deleted.sorted == planned.sorted)
    deleted.foreach(rel => assert(!new java.io.File(dir, rel).exists(), rel))
    assert(DeltaReader.read(spark, dir).select("id").as[Long].collect().toSet == before)
  }

  test("distributed delete path handles >64 root-level orphans") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac_many_").toFile.getPath
    LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "v"), dir)
    val orphans = (0 until 100).map(i => f"orphan_$i%03d.parquet")
    orphans.foreach(n => java.nio.file.Files.write(
      new java.io.File(dir, n).toPath, Array[Byte](1)))
    val deleted = LakeWriter.vacuumDelta(spark, dir, horizonVersion = 0L)
    assert(deleted.toSet == orphans.toSet, deleted.take(5).mkString(", "))
    orphans.foreach(n => assert(!new java.io.File(dir, n).exists(), n))
    assert(rows(DeltaReader.read(spark, dir)) == Set((1L, "a")))
  }

  test("VACUUM LITE reclaims from the log alone: tombstones + cdc yes, debris no") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a")))
    val f1 = part(dir, "part-0001.parquet", Seq((1L, "b")))
    val fc = part(dir, "part-compact.parquet", Seq((0L, "a"), (1L, "b")))
    part(dir, "orphan.parquet", Seq((9L, "x"))) // debris no log action names
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine, add(f0)))
    commit(log, 1, Seq(add(f1)))
    commit(log, 2, Seq(add(fc), remove(f0), remove(f1)))
    commit(log, 3, Seq(add("part-0003.parquet")))
    part(dir, "part-0003.parquet", Seq((2L, "c")))
    val before = rows(DeltaReader.read(spark, dir.getPath))

    // DRY RUN names exactly the log-visible candidates; debris is NOT one
    val planned = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 3L,
      dryRun = true, lite = true)
    assert(planned.toSet == Set(f0, f1), planned.mkString(", "))
    assert(new java.io.File(dir, f0).exists(), "DRY RUN must not delete")

    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 3L,
      lite = true)
    assert(deleted.toSet == Set(f0, f1), deleted.mkString(", "))
    assert(!new java.io.File(dir, f0).exists() && !new java.io.File(dir, f1).exists())
    assert(new java.io.File(dir, "orphan.parquet").exists(),
      "LITE must not touch files the log never named — that's FULL's job")
    assert(rows(DeltaReader.read(spark, dir.getPath)) == before)
    // a later FULL pass sweeps the debris
    val full = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 3L)
    assert(full.contains("orphan.parquet"), full.mkString(", "))
  }

  test("VACUUM never follows an absolute log path outside the table root (FULL and LITE)") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a")))
    // a foreign writer's files living OUTSIDE this table's root —
    // protocol-legal absolute entries (e.g. a clone source's data and
    // change data), in BOTH absolute spellings: URI scheme and
    // scheme-less leading slash (the shape new Path(root, rel) would
    // resolve absolute)
    val outside = java.nio.file.Files.createTempDirectory("graft_vac_outside_").toFile
    val extCdc = new java.io.File(outside, "cdc-ext.parquet")
    val extData = new java.io.File(outside, "data-ext.parquet")
    java.nio.file.Files.write(extCdc.toPath, Array[Byte](1, 2, 3))
    java.nio.file.Files.write(extData.toPath, Array[Byte](4, 5, 6))
    // plus a root-relative cdc file that IS genuinely reclaimable
    val cdcDir = new java.io.File(dir, "_change_data"); cdcDir.mkdirs()
    java.nio.file.Files.write(new java.io.File(cdcDir, "cdc-0.parquet").toPath, Array[Byte](1))
    def cdc(p: String) =
      s"""{"cdc":{"path":"$p","partitionValues":{},"size":1,"dataChange":false}}"""
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine, add(f0),
      cdc("_change_data/cdc-0.parquet"),
      cdc(s"file:${extCdc.getAbsolutePath}"),
      remove(extData.getAbsolutePath)))
    commit(log, 1, Seq(add(f0)))
    Seq(true, false).foreach { lite =>
      val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 1L,
        dryRun = true, lite = lite)
      assert(deleted.forall(p => !p.startsWith("/") && !p.contains(outside.getName)),
        s"lite=$lite planned an outside-root delete: ${deleted.mkString(", ")}")
    }
    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 1L,
      lite = true)
    assert(deleted.toSet == Set("_change_data/cdc-0.parquet"), deleted.mkString(", "))
    assert(extCdc.exists() && extData.exists(),
      "vacuum escaped the table root — the clone contract is broken")
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a")))
  }

  test("VACUUM LITE spares tombstoned-then-readded files and is idempotent") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a")))
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine, add(f0)))
    commit(log, 1, Seq(remove(f0)))
    commit(log, 2, Seq(add(f0))) // RESTORE-style re-add
    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, 2L, lite = true)
    assert(deleted.isEmpty, deleted.mkString(", "))
    assert(new java.io.File(dir, f0).exists())
    // idempotent: a second LITE at the same horizon finds nothing
    assert(LakeWriter.vacuumDelta(spark, dir.getPath, 2L, lite = true).isEmpty)
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a")))
  }

  test("SQL VACUUM ... LITE routes and returns DRY RUN candidates") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vac_sql_lite_").toFile.getPath
    LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.compactDelta(spark, dir) // tombstones the two originals
    val planned = spark.sql(s"VACUUM graft_delta.`$dir` LITE RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0))
    assert(planned.length == 2, planned.mkString(", "))
    spark.sql(s"VACUUM graft_delta.`$dir` LITE RETAIN 1 VERSIONS")
    planned.foreach(rel => assert(!new java.io.File(dir, rel).exists(), rel))
    assert(DeltaReader.read(spark, dir).count() == 2)
  }

  test("a live storageType 'p' DV sidecar under the root survives vacuum (FULL and LITE)") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a"), (1L, "b")))
    // portable bitmap deleting row 1, laid out as a sidecar FILE:
    // version byte 1, then at offset 1: big-endian size + data + CRC
    val bos = new java.io.ByteArrayOutputStream()
    val payload = new java.io.DataOutputStream(bos)
    payload.writeInt(Integer.reverseBytes(1681511377))
    payload.writeLong(java.lang.Long.reverseBytes(1L))
    payload.writeInt(Integer.reverseBytes(0))
    val rb = new org.roaringbitmap.RoaringBitmap(); rb.add(1); rb.serialize(payload)
    payload.flush()
    val data = bos.toByteArray
    val fileBytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(fileBytes)
    out.writeByte(1)
    out.writeInt(data.length)
    out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(data)
    out.writeInt(crc.getValue.toInt)
    out.flush()
    val pdv = new java.io.File(dir, "pdv.bin")
    java.nio.file.Files.write(pdv.toPath, fileBytes.toByteArray)
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      s"""{"add":{"path":"$f0","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"p","pathOrInlineDv":"${pdv.getPath}","offset":1,"sizeInBytes":${data.length},"cardinality":1}}}"""))
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a")))
    // FULL: the walk lists pdv.bin; the referenced set must protect it
    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, 0L)
    assert(deleted.isEmpty, deleted.mkString(", "))
    assert(pdv.exists(), "vacuum deleted a LIVE 'p'-type deletion vector")
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a")),
      "deleted rows resurrected after vacuum")
    // LITE at the same horizon: nothing named reclaimable either
    assert(LakeWriter.vacuumDelta(spark, dir.getPath, 0L, lite = true).isEmpty)
    assert(pdv.exists())
  }

  test("vacuum on a deletion-vector table keeps the DV view intact") {
    val (dir, log) = mkTable()
    val f0 = part(dir, "part-0000.parquet", Seq((0L, "a"), (1L, "b")))
    // minimal inline DV deleting row 1 (portable bitmap via the reader's
    // own encoder helpers, exercised end-to-end in DeltaDvSpec)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Integer.reverseBytes(1681511377))
    out.writeLong(java.lang.Long.reverseBytes(1L))
    out.writeInt(Integer.reverseBytes(0))
    val rb = new org.roaringbitmap.RoaringBitmap(); rb.add(1); rb.serialize(out)
    out.flush()
    val data = bos.toByteArray
    val padded = data ++ new Array[Byte]((4 - data.length % 4) % 4)
    commit(log, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine,
      s"""{"add":{"path":"$f0","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${
        DeltaReader.base85Encode(padded)}","sizeInBytes":${data.length},"cardinality":1}}}"""))
    // vacuum at the only version: nothing to reclaim, and the
    // horizon checkpoint it writes must RE-EMIT the inline descriptor
    // (a DV-less checkpoint would resurrect row 1 as the replay base)
    val deleted = LakeWriter.vacuumDelta(spark, dir.getPath, 0L)
    assert(deleted.isEmpty, deleted.mkString(", "))
    assert(rows(DeltaReader.read(spark, dir.getPath)) == Set((0L, "a")))
    val snap = DeltaReader.snapshot(spark, dir.getPath, None)
    assert(snap.active.head.dv.exists(_.cardinality == 1L))
  }
}
