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
}
