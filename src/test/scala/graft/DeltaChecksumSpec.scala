package graft

import graft.sources.{DeltaReader, LakeWriter}

/** Version checksums (`<version>.crc`, delta-spark's VersionChecksum):
  * folded incrementally from the previous checksum plus the commit's
  * own actions, re-seeded by checkpoints, validated on demand against
  * a fresh replay — the early-warning signal for a lost commit.
  */
class DeltaChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_crc_$tag").resolve("t")
      .toAbsolutePath.toString

  private def crc(dir: String, v: Long): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val f = new java.io.File(dir, "_delta_log/" + f"$v%020d.crc")
    if (!f.exists()) None
    else Some(new com.fasterxml.jackson.databind.ObjectMapper().readTree(f))
  }

  test("every commit writes a checksum; counts and bytes fold through appends, deletes and compaction") {
    val d = tmp("fold")
    LakeWriter.writeDelta(spark.range(100).toDF("k").repartition(2), d)
    val c0 = crc(d, 0L).get
    assert(c0.get("numFiles").asLong() == 2L, c0.toString)
    assert(c0.get("tableSizeBytes").asLong() > 0L)
    assert(c0.get("metadata").has("schemaString") && c0.get("protocol").has("minWriterVersion"))

    LakeWriter.appendDelta(spark.range(100, 150).toDF("k").repartition(1), d)
    assert(crc(d, 1L).get.get("numFiles").asLong() == 3L)

    LakeWriter.deleteWhere(spark, d, "k < 50")   // rewrites one file
    val c2 = crc(d, 2L).get
    val live = DeltaReader.snapshot(spark, d, None).active
    assert(c2.get("numFiles").asLong() == live.size.toLong)
    assert(c2.get("tableSizeBytes").asLong() == live.map(_.size).sum)

    LakeWriter.compactDelta(spark, d, minFiles = 1)
    val v = DeltaReader.snapshot(spark, d, None).version
    val liveC = DeltaReader.snapshot(spark, d, None).active
    assert(crc(d, v).get.get("numFiles").asLong() == liveC.size.toLong)

    // validate every retained version against its replay
    (0L to v).foreach { ver =>
      assert(DeltaReader.validateChecksum(spark, d, Some(ver)), s"version $ver")
    }
  }

  test("a tampered checksum fails validation loudly; a missing one answers false") {
    val d = tmp("tamper")
    LakeWriter.writeDelta(spark.range(10).toDF("k"), d)
    assert(DeltaReader.validateChecksum(spark, d, None))
    val f = new java.io.File(d, "_delta_log/" + "0" * 20 + ".crc")
    val edited = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .replaceFirst("\"numFiles\":\\d+", "\"numFiles\":99")
    java.nio.file.Files.write(f.toPath, edited.getBytes("UTF-8"))
    // drop Hadoop's local-FS sidecar checksum of the edited file, or
    // ChecksumFileSystem refuses the read before our validation runs
    new java.io.File(f.getParent, "." + f.getName + ".crc").delete()
    graft.sources.DeltaReader.SnapshotCache.clear()
    val e = intercept[IllegalStateException](DeltaReader.validateChecksum(spark, d, None))
    assert(e.getMessage.contains("checksum mismatch"), e.getMessage)
    assert(f.delete())
    assert(!DeltaReader.validateChecksum(spark, d, None))
  }

  test("a broken chain heals at the checkpoint, and later commits fold from the re-seed") {
    val d = tmp("heal")
    LakeWriter.writeDelta(spark.range(20).toDF("k").repartition(2), d)
    LakeWriter.appendDelta(spark.range(20, 30).toDF("k"), d)
    // break the chain: remove every crc (a foreign-history table)
    new java.io.File(d, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(f => assert(f.delete()))
    // the next commit cannot fold (no predecessor) — writes nothing
    LakeWriter.appendDelta(spark.range(30, 40).toDF("k"), d)
    assert(crc(d, 2L).isEmpty)
    // the checkpoint re-seeds from the live set it aggregates anyway
    LakeWriter.checkpointDelta(spark, d, 2L)
    assert(crc(d, 2L).isDefined)
    assert(DeltaReader.validateChecksum(spark, d, None))
    // and the chain folds forward again
    LakeWriter.appendDelta(spark.range(40, 45).toDF("k"), d)
    assert(crc(d, 3L).isDefined)
    assert(DeltaReader.validateChecksum(spark, d, None))
  }

  test("expired-log cleanup deletes aged checksums with their commits") {
    val d = tmp("clean")
    LakeWriter.writeDelta(spark.range(10).toDF("k"), d)
    (1 to 4).foreach(i => LakeWriter.appendDelta(spark.range(i * 10, i * 10 + 5).toDF("k"), d))
    LakeWriter.checkpointDelta(spark, d, 2L)
    val log = new java.io.File(d, "_delta_log")
    // age versions 0-1 past retention
    log.listFiles().filter(f => f.getName.matches("0{19}[01]\\.(json|crc)"))
      .foreach(f => assert(f.setLastModified(1000L)))
    val victims = LakeWriter.cleanExpiredLogs(spark, d,
      nowMillis = Some(System.currentTimeMillis()))
    assert(victims.exists(_.endsWith(".crc")), victims.mkString(", "))
    assert(!log.listFiles().exists(_.getName == "0" * 20 + ".crc"))
    // retained versions keep theirs; the table still validates
    assert(log.listFiles().exists(_.getName == "0" * 19 + "4.crc"))
    assert(DeltaReader.validateChecksum(spark, d, None))
  }

  test("a checkpoint re-seed writes the table's REAL metaData action verbatim, not a field subset") {
    val d = tmp("reseed_meta")
    LakeWriter.writeDelta(spark.range(10).toDF("k"), d,
      configuration = Map("delta.appendOnly" -> "false"))
    LakeWriter.appendDelta(spark.range(10, 20).toDF("k"), d)
    // the commit's own metaData node — what delta-spark's
    // read-from-checksum optimization compares against replayed state
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val commitMeta = java.nio.file.Files.readAllLines(
      new java.io.File(d, "_delta_log/" + "0" * 20 + ".json").toPath)
      .stream().filter(_.startsWith("""{"metaData""""))
      .findFirst().map[com.fasterxml.jackson.databind.JsonNode](
        l => om.readTree(l).get("metaData")).get()
    assert(commitMeta.has("format"),
      s"fixture assumes graft metaData carries format: $commitMeta")
    // break the chain and re-seed at a checkpoint
    new java.io.File(d, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(f => assert(f.delete()))
    graft.sources.DeltaReader.SnapshotCache.clear()
    LakeWriter.checkpointDelta(spark, d, 1L)
    val reseeded = crc(d, 1L).get.get("metadata")
    // VERBATIM: every field of the real action, byte-equal values —
    // format included (the old synthesis dropped it)
    assert(reseeded == commitMeta, s"reseeded=$reseeded\ncommit=$commitMeta")
    // and the incremental fold inherits the full node
    LakeWriter.appendDelta(spark.range(20, 30).toDF("k"), d)
    assert(crc(d, 2L).get.get("metadata") == commitMeta)
    assert(DeltaReader.validateChecksum(spark, d, None))
  }

  test("a duplicate remove of one path in a single commit makes the fold unfoldable (no .crc written)") {
    val d = tmp("dup_remove")
    LakeWriter.writeDelta(spark.range(10).toDF("k"), d)
    assert(crc(d, 0L).isDefined)
    val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(
      spark.sessionState.newHadoopConf())
    val commit1 = new org.apache.hadoop.fs.Path(d, "_delta_log/" + "0" * 19 + "1.json")
    // protocol-legal idempotent-retry shape: the same path removed
    // twice — counting it -1 twice would skew numFiles and make
    // validateChecksum cry 'lost commit' on a healthy table
    val content = Seq(
      """{"commitInfo":{"timestamp":0,"operation":"DELETE","engineInfo":"test"}}""",
      """{"remove":{"path":"part-x.parquet","deletionTimestamp":0,"size":100,"dataChange":true}}""",
      """{"remove":{"path":"part-x.parquet","deletionTimestamp":0,"size":100,"dataChange":true}}"""
    ).mkString("\n").getBytes("UTF-8")
    LakeWriter.writeVersionChecksum(fs, commit1, content)
    assert(crc(d, 1L).isEmpty, "duplicate remove must not fold a checksum")
  }

  test("operation-metrics injection passes empty commit content through untouched") {
    assert(LakeWriter.injectOperationMetrics(Array.emptyByteArray).isEmpty)
    val odd = "not json".getBytes("UTF-8")
    assert(LakeWriter.injectOperationMetrics(odd).sameElements(odd))
  }
}
