package graft

import graft.sources.{DeltaReader, LakeWriter}

/** The snapshot cache (DeltaReader.SnapshotCache): N repeated reads at
  * one version replay the log ONCE; any change to the `_delta_log`
  * listing — a commit, a checkpoint, vacuum's retention cleaning —
  * changes the fingerprint and forces a fresh replay, so no entry can
  * serve a state the log no longer describes.
  */
class SnapshotCacheSpec extends SparkSpec {

  private def replays: Long = DeltaReader.replayCounter.get()

  private def mkTable(rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snapcache_").toFile.getPath
    LakeWriter.writeDelta(rows.toDF("id", "v"), dir)
    dir
  }

  test("N repeated reads at the same version replay the log once") {
    val s = spark
    import s.implicits._
    val dir = mkTable(Seq((1L, "a"), (2L, "b")))
    LakeWriter.appendDelta(Seq((3L, "c")).toDF("id", "v"), dir)
    val before = replays
    val first = DeltaReader.read(spark, dir).count()
    assert(first == 3L)
    val afterFirst = replays
    assert(afterFirst > before, "the first read must replay")
    (1 to 5).foreach { _ =>
      assert(DeltaReader.read(spark, dir).count() == 3L)
      assert(DeltaReader.snapshot(spark, dir, None).version == 1L)
    }
    assert(replays == afterFirst,
      s"repeated reads at an unchanged log must be cache hits (replays went " +
        s"$afterFirst -> $replays)")
  }

  test("a commit changes the listing and forces exactly one fresh replay") {
    val s = spark
    import s.implicits._
    val dir = mkTable(Seq((1L, "a")))
    assert(DeltaReader.read(spark, dir).count() == 1L)
    val cachedAt = replays
    LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(DeltaReader.read(spark, dir).count() == 2L, "the append must be visible")
    assert(replays > cachedAt, "a new commit must invalidate the cached latest")
    val afterAppend = replays
    assert(DeltaReader.read(spark, dir).count() == 2L)
    assert(replays == afterAppend, "the post-append snapshot caches again")
  }

  test("time-travel snapshots cache per version and vacuum invalidates them") {
    val s = spark
    import s.implicits._
    val dir = mkTable(Seq((1L, "a")))
    LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "v"), dir)
    LakeWriter.appendDelta(Seq((3L, "c")).toDF("id", "v"), dir)
    // prime the cache at version 0 (below the upcoming horizon)
    assert(DeltaReader.read(spark, dir, Some(0L)).count() == 1L)
    val primed = replays
    assert(DeltaReader.read(spark, dir, Some(0L)).count() == 1L)
    assert(replays == primed, "the versionAsOf snapshot must be a cache hit")
    // vacuum at horizon 2 rewrites the log listing (checkpoint added,
    // pre-horizon commits removed): the cached version-0 entry must NOT
    // keep serving a state whose replay chain is gone
    LakeWriter.vacuumDelta(spark, dir, horizonVersion = 2L)
    val e = intercept[IllegalArgumentException] {
      DeltaReader.read(spark, dir, Some(0L))
    }
    assert(e.getMessage.contains("not present") || e.getMessage.contains("partial snapshot"),
      e.getMessage)
    // the surviving horizon version still reads, freshly replayed
    assert(DeltaReader.read(spark, dir, Some(2L)).count() == 3L)
  }

  test("spark.graft.delta.snapshotCache.enabled=false bypasses the cache") {
    val s = spark
    import s.implicits._
    val dir = mkTable(Seq((1L, "a")))
    spark.conf.set("spark.graft.delta.snapshotCache.enabled", "false")
    try {
      val r0 = replays
      DeltaReader.snapshot(spark, dir, None)
      DeltaReader.snapshot(spark, dir, None)
      assert(replays == r0 + 2, "with the cache off every snapshot call replays")
    } finally spark.conf.unset("spark.graft.delta.snapshotCache.enabled")
  }

  test("commit-parse memo: repeated history/CDF reads parse each retained commit once") {
    val s = spark
    import s.implicits._
    def parses: Long = DeltaReader.commitParseCounter.get()
    val dir = mkTable(Seq((1L, "a")))
    (2 to 5).foreach(i => LakeWriter.appendDelta(Seq((i.toLong, "x")).toDF("id", "v"), dir))

    assert(DeltaReader.history(spark, dir).count() == 5L)
    val afterFirst = parses
    (1 to 4).foreach(_ => assert(DeltaReader.history(spark, dir).count() == 5L))
    assert(parses == afterFirst,
      s"repeated DESCRIBE HISTORY must hit the memo ($afterFirst -> $parses)")

    // CDF replay over the same commits: file/cdc actions come from the
    // SAME parse pass history populated — zero new parses
    assert(DeltaReader.readChanges(spark, dir, 0L, 4L).count() == 5L)
    assert(parses == afterFirst,
      s"readChanges over memoized commits must not re-parse ($afterFirst -> $parses)")

    // a new commit parses exactly once more on the next history call
    LakeWriter.appendDelta(Seq((6L, "y")).toDF("id", "v"), dir)
    assert(DeltaReader.history(spark, dir).count() == 6L)
    val afterAppend = parses
    assert(afterAppend >= afterFirst + 1,
      "the new commit must parse (history sees 6 versions)")
    assert(DeltaReader.history(spark, dir).count() == 6L)
    assert(parses == afterAppend, "old entries must survive the append")

    // overwriting a commit file in place (adversarial fixture edit)
    // changes its identity and forces a fresh parse
    val v0 = new java.io.File(dir, "_delta_log/" + "0" * 20 + ".json")
    val edited = new String(java.nio.file.Files.readAllBytes(v0.toPath), "UTF-8")
      .replace(""""operation":"CREATE TABLE"""", """"operation":"EDITED FIXTURE"""")
    java.nio.file.Files.write(v0.toPath, edited.getBytes("UTF-8"))
    // the direct edit invalidates Hadoop LocalFileSystem's checksum sidecar
    new java.io.File(v0.getParentFile, s".${v0.getName}.crc").delete()
    val ops = DeltaReader.history(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(0L) == "EDITED FIXTURE",
      s"an edited commit file must re-parse, got ${ops(0L)}")
  }
}
