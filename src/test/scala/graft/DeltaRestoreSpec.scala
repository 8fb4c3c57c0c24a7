package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame

/** RESTORE (`LakeWriter.restoreDelta`) against the table lifecycle:
  * appends, copy-on-write deletes, DV deletes, vacuumed files, the
  * metadata gate, and pre-restore history survival.
  */
class DeltaRestoreSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("restore rewinds appends and deletes; pre-restore history stays readable") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_restore_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir) // v0
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)           // v1
    LakeWriter.deleteWhere(spark, dir, "id = 0")                                      // v2

    val (readded, removed) = LakeWriter.restoreDelta(spark, dir, 0L)                  // v3
    assert(readded.nonEmpty && removed.nonEmpty)
    // latest = exactly the v0 state
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b")))
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.version == 3L)
    // the pre-restore states are still time-travelable
    assert(rows(DeltaReader.read(spark, dir, Some(2L))) == Set((1L, "b"), (2L, "c")))
    assert(rows(DeltaReader.read(spark, dir, Some(1L))) ==
      Set((0L, "a"), (1L, "b"), (2L, "c")))
    // restoring to the state we are already in writes NO commit
    assert(LakeWriter.restoreDelta(spark, dir, 0L) == ((Nil, Nil)))
    assert(DeltaReader.snapshot(spark, dir, None).version == 3L)
  }

  test("restore across a DV delete re-adds the pre-DV descriptor (rows un-delete)") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_restore_dv_")
    LakeWriter.writeDelta(
      Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").coalesce(1), dir) // v0
    LakeWriter.deleteWhereDv(spark, dir, "id = 1")                           // v1
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (2L, "c")))

    val (readded, removed) = LakeWriter.restoreDelta(spark, dir, 0L)         // v2
    // same physical file, descriptor change only: one re-add, no remove
    assert(readded.size == 1 && removed.isEmpty)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    // and the DV'd intermediate state is still travelable
    assert(rows(DeltaReader.read(spark, dir, Some(1L))) == Set((0L, "a"), (2L, "c")))
    // the checksum chain folds the replacement re-add correctly (the
    // path was LIVE at v1 — +1 without the crcReplaced hint)
    (0L to 2L).foreach { v =>
      assert(DeltaReader.validateChecksum(spark, dir, Some(v)), s"version $v")
    }
  }

  test("restore refuses when the target version's files were vacuumed away") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_restore_vac_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)   // v0
    val tombstoned = LakeWriter.deleteWhere(spark, dir, "id = 0")            // v1
    assert(tombstoned.size == 1)
    // physically reclaim the tombstoned file while LEAVING the log (the
    // mid-vacuum / external-cleanup shape): the restore must notice the
    // dangling file before committing, not corrupt the table
    val gone = new java.io.File(dir, tombstoned.head)
    assert(gone.delete(), s"fixture: could not delete $gone")
    val e = intercept[IllegalArgumentException] {
      LakeWriter.restoreDelta(spark, dir, 0L)
    }
    assert(e.getMessage.contains("no longer exists"))
    // and the failed restore wrote NO commit
    assert(DeltaReader.snapshot(spark, dir, None).version == 1L)

    // a FULL vacuum also removes the target version's log — the
    // reader's not-present gate refuses before the file check ever runs
    val dir2 = tmp("graft_restore_vac2_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir2)
    LakeWriter.deleteWhere(spark, dir2, "id = 0")
    LakeWriter.vacuumDelta(spark, dir2, 1L)
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.restoreDelta(spark, dir2, 0L)
    }
    assert(e2.getMessage.contains("not present"))
  }

  test("restore refuses across a metadata change and on append-only tables") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_restore_meta_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)
    // hand-write a v1 metaData change (add a configuration key): the
    // writer must refuse to restore across it
    val log = new java.io.File(dir, "_delta_log")
    val v0 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(log, "0" * 20 + ".json").toPath), "UTF-8")
    val meta = v0.linesIterator.find(_.contains("\"metaData\"")).get
      .replace("\"configuration\":{}", "\"configuration\":{\"graft.marker\":\"1\"}")
    java.nio.file.Files.write(
      new java.io.File(log, "0" * 19 + "1.json").toPath, meta.getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      LakeWriter.restoreDelta(spark, dir, 0L)
    }
    assert(e.getMessage.contains("metadata changed"))

    val dir2 = tmp("graft_restore_ao_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir2)
    val log2 = new java.io.File(dir2, "_delta_log")
    val v0b = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(log2, "0" * 20 + ".json").toPath), "UTF-8")
    val metaAo = v0b.linesIterator.find(_.contains("\"metaData\"")).get
      .replace("\"configuration\":{}", "\"configuration\":{\"delta.appendOnly\":\"true\"}")
    java.nio.file.Files.write(
      new java.io.File(log2, "0" * 19 + "1.json").toPath, metaAo.getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.restoreDelta(spark, dir2, 0L)
    }
    assert(e2.getMessage.contains("appendOnly"))
  }

  test("history surfaces each commit's operation, newest first") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_hist_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir) // v0
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)           // v1
    LakeWriter.deleteWhere(spark, dir, "id = 0")                                      // v2
    LakeWriter.updateWhere(spark, dir, "id = 1", Map("v" -> "'B'"))                   // v3
    LakeWriter.mergeInto(spark, dir, Seq((5L, "e")).toDF("id", "v"), Seq("id"))       // v4
    LakeWriter.compactDelta(spark, dir, minFiles = 2)                                 // v5
    LakeWriter.restoreDelta(spark, dir, 1L)                                           // v6
    val h = DeltaReader.history(spark, dir)
      .select("version", "operation").as[(Long, String)].collect().toSeq
    assert(h == Seq(6L -> "RESTORE", 5L -> "OPTIMIZE", 4L -> "MERGE", 3L -> "UPDATE",
      2L -> "DELETE", 1L -> "WRITE", 0L -> "CREATE TABLE"), h.toString)
    // readVersion chains each commit to its parent
    val rv = DeltaReader.history(spark, dir)
      .where("version = 6").select("readVersion").as[Long].head()
    assert(rv == 5L)
  }

  test("retryOnConflict re-runs a writer that lost the commit race") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_retry_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir) // v0
    // the op reads its snapshot, then a competitor commits the SAME
    // next version before our commit lands — attempt 1 loses the
    // create-if-absent race; the retry replays the log (sees the
    // competitor) and lands at the version after it
    var raced = false
    LakeWriter.retryOnConflict(3) {
      val snap = DeltaReader.snapshot(spark, dir, None)
      if (!raced) {
        raced = true
        val log = new java.io.File(dir, "_delta_log")
        java.nio.file.Files.write(
          new java.io.File(log, f"${snap.version + 1}%020d.json").toPath,
          """{"add":{"path":"competitor.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
            .getBytes("UTF-8"))
        // the competitor's add needs a real (if trivial) file so later
        // reads do not die on a missing path — reuse v0's parquet
        val v0file = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(v0file.toPath,
          new java.io.File(dir, "competitor.parquet").toPath)
      }
      LakeWriter.appendDeltaWithSnapshot(
        Seq((9L, "z")).toDF("id", "v").coalesce(1), dir, 0, None, snap)
    }
    assert(raced)
    val latest = DeltaReader.snapshot(spark, dir, None)
    assert(latest.version == 2L, s"retry must land AFTER the competitor, got ${latest.version}")
    assert(DeltaReader.read(spark, dir).where("id = 9").count() == 1L)
    // attempts exhausted -> the conflict surfaces. The competitor must
    // carry a REBASE-UNSAFE action (a txn identifier here): a pure-add
    // competitor no longer conflicts at all — the append rebases past
    // it without re-running (OccRebaseSpec pins that path).
    val e = intercept[IllegalStateException] {
      LakeWriter.retryOnConflict(2) {
        val snap = DeltaReader.snapshot(spark, dir, None)
        val log = new java.io.File(dir, "_delta_log")
        val f = new java.io.File(log, f"${snap.version + 1}%020d.json")
        if (!f.isFile) java.nio.file.Files.write(f.toPath,
          ("""{"txn":{"appId":"competitor","version":1}}""" + "\n" +
            """{"add":{"path":"competitor.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
            .getBytes("UTF-8"))
        LakeWriter.appendDeltaWithSnapshot(
          Seq((7L, "q")).toDF("id", "v").coalesce(1), dir, 0, None, snap)
      }
    }
    assert(e.getMessage.contains("a concurrent writer won"))
    assert(e.getMessage.contains("txn"), e.getMessage)
  }
}
