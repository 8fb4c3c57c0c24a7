package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame

/** Log compaction files (`<x>.<y>.compacted.json`): reconciled
  * replay segments that survive retention cleaning the covered
  * commits.
  */
class DeltaLogCompactSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  /** v0: {0,1}; v1: +{2}; v2: delete id=1; v3: +{3} (txn app-x=9). */
  private def mkTable(): String = {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_logc_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.deleteWhere(spark, dir, "id = 1")
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v").coalesce(1), dir,
      txn = Some(("app-x", 9L)))
    dir
  }
  private val full = Set((0L, "a"), (2L, "c"), (3L, "d"))

  test("a compacted range substitutes for its commits after retention cleans them") {
    val dir = mkTable()
    val name = LakeWriter.compactLog(spark, dir, 1L, 3L)
    assert(name == "00000000000000000001.00000000000000000003.compacted.json")
    // still reads identically with both commit forms present
    assert(rows(DeltaReader.read(spark, dir)) == full)
    // clean the covered commits: the compacted file is the only path
    val log = new java.io.File(dir, "_delta_log")
    (1L to 3L).foreach(v => new java.io.File(log, f"$v%020d.json").delete())
    assert(rows(DeltaReader.read(spark, dir)) == full)
    // the txn watermark survives through the reconciled segment
    assert(DeltaReader.lastTxnVersion(spark, dir, "app-x") == 9L)
    // the range END is still a reachable versionAsOf; an INTERIOR
    // version of the cleaned range is not
    assert(rows(DeltaReader.read(spark, dir, Some(3L))) == full)
    intercept[IllegalArgumentException](DeltaReader.read(spark, dir, Some(2L)))
    // appends continue on top (version discovery sees the range end)
    val s = spark
    import s.implicits._
    LakeWriter.appendDelta(Seq((4L, "e")).toDF("id", "v").coalesce(1), dir)
    assert(rows(DeltaReader.read(spark, dir)) == full + ((4L, "e")))
  }

  test("partial coverage mixes compacted segments with plain commits") {
    val dir = mkTable()
    LakeWriter.compactLog(spark, dir, 1L, 2L)
    val log = new java.io.File(dir, "_delta_log")
    (1L to 2L).foreach(v => new java.io.File(log, f"$v%020d.json").delete())
    // replay = commit 0, compacted [1,2], commit 3
    assert(rows(DeltaReader.read(spark, dir)) == full)
  }

  test("a compacted range STRADDLING the checkpoint base replays idempotently") {
    val dir = mkTable()
    // checkpoint INSIDE the compacted range, then clean everything the
    // checkpoint + straddling compaction can reconstruct without
    LakeWriter.compactLog(spark, dir, 0L, 3L)
    LakeWriter.checkpointDelta(spark, dir, 2L)
    val log = new java.io.File(dir, "_delta_log")
    (0L to 3L).foreach(v => new java.io.File(log, f"$v%020d.json").delete())
    // replay = checkpoint@2 + compacted [0,3] applied on top (final
    // actions at or below 2 reapply idempotently; version 3's append
    // comes from the same file)
    assert(rows(DeltaReader.read(spark, dir)) == full)
    assert(DeltaReader.lastTxnVersion(spark, dir, "app-x") == 9L)
  }

  test("refusals: missing commit in range, duplicate compaction, interior gap") {
    val dir = mkTable()
    val log = new java.io.File(dir, "_delta_log")
    LakeWriter.compactLog(spark, dir, 1L, 2L)
    intercept[IllegalStateException](LakeWriter.compactLog(spark, dir, 1L, 2L))
    // make the gap INTERIOR: v4 exists, v3's commit is gone and no
    // compaction covers it — replay to latest must refuse, not skip
    val s = spark
    import s.implicits._
    LakeWriter.appendDelta(Seq((4L, "e")).toDF("id", "v").coalesce(1), dir)
    new java.io.File(log, f"${3L}%020d.json").delete()
    intercept[Exception](LakeWriter.compactLog(spark, dir, 2L, 3L))
    val e = intercept[RuntimeException](DeltaReader.read(spark, dir))
    assert(e.getMessage.contains("not reconstructible") ||
      e.getMessage.contains("refusing a partial snapshot"))
  }

  test("vacuum reclaims compaction files wholly below the horizon") {
    val dir = mkTable()
    LakeWriter.compactLog(spark, dir, 1L, 2L)
    LakeWriter.vacuumDelta(spark, dir, 3L)
    val log = new java.io.File(dir, "_delta_log")
    assert(!log.listFiles().exists(_.getName.endsWith(".compacted.json")))
    assert(rows(DeltaReader.read(spark, dir)) == full)
  }
}
