package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** updateWhereDv — merge-on-read UPDATE: matched rows DV'd dead in
  * place, updated versions staged as new small files, one atomic
  * commit, write cost ∝ updated rows.
  */
class DeltaDvUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dvu_$tag").resolve("t")
      .toAbsolutePath.toString

  private def base: DataFrame =
    (1 to 30).map(i => (i.toLong, Seq("a", "b", "c")(i % 3), i * 1.0))
      .toDF("id", "k", "v")

  test("targeted update DVs the old rows in place and stages only the new ones") {
    val d = freshDir("t")
    LakeWriter.writeDelta(base.repartition(3), d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val before = DeltaReader.snapshot(spark, d, None).active.map(_.path).toSet
    val touched = LakeWriter.updateWhereDv(spark, d, "id <= 3", Map("v" -> "v * 100"))
    assert(touched.nonEmpty)
    val snap = DeltaReader.snapshot(spark, d, None)
    // every pre-update file is still live (no rewrite); the touched
    // ones carry DVs; the only new files are the small part-updv adds
    assert(before.subsetOf(snap.active.map(_.path).toSet))
    assert(snap.active.filter(a => touched.contains(a.path)).forall(_.dv.isDefined))
    val newFiles = snap.active.map(_.path).filterNot(before)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("part-updv-")))
    // values: updated rows doubled, the rest untouched, count stable
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 30)
    assert(out.where(col("id") === 2L).head().getDouble(2) == 200.0)
    assert(out.where(col("id") === 10L).head().getDouble(2) == 10.0)
    // time travel below the update sees the old values
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0))
      .where(col("id") === 2L).head().getDouble(2) == 2.0)
    // CDF: complete pre/post images for exactly the matched rows
    val ch = DeltaReader.readChanges(spark, d, 1, 1)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("update_preimage" -> 3L, "update_postimage" -> 3L))
    // a second DV update on the same file UNIONS the bitmaps
    LakeWriter.updateWhereDv(spark, d, "id = 4", Map("v" -> "0.0 - v"))
    val out2 = DeltaReader.read(spark, d)
    assert(out2.count() == 30)
    assert(out2.where(col("id") === 4L).head().getDouble(2) == -4.0)
    assert(out2.where(col("id") === 2L).head().getDouble(2) == 200.0)
    // OPTIMIZE folds the DV debt away with every row preserved
    LakeWriter.compactDelta(spark, d, minFiles = 1)
    val folded = DeltaReader.read(spark, d)
    assert(folded.count() == 30)
    assert(folded.where(col("id") === 4L).head().getDouble(2) == -4.0)
    assert(DeltaReader.snapshot(spark, d, None).active.forall(_.dv.isEmpty))
  }

  test("partition-moving SET stages rows under their new directories") {
    val d = freshDir("pm")
    LakeWriter.writeDelta(base, d, partitionBy = Seq("k"))
    LakeWriter.updateWhereDv(spark, d, "id = 3", Map("k" -> "'z'"))
    val out = DeltaReader.read(spark, d)
    assert(out.where(col("k") === "z").collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(out.count() == 30)
    val moved = DeltaReader.snapshot(spark, d, None).active
      .filter(_.path.contains("part-updv-"))
    assert(moved.nonEmpty && moved.forall(_.partitionValues("k") == "z"))
  }

  test("SQL DELETE/UPDATE go merge-on-read on delta.enableDeletionVectors tables") {
    GraftExtensions.register(spark)
    val d = freshDir("sqlmor")
    LakeWriter.writeDelta(base.repartition(2), d,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val before = DeltaReader.snapshot(spark, d, None).active.map(_.path).toSet
    spark.sql(s"DELETE FROM graft_delta.`$d` WHERE id = 7")
    spark.sql(s"UPDATE graft_delta.`$d` SET v = 0.0 WHERE id = 8")
    val snap = DeltaReader.snapshot(spark, d, None)
    // the original files were never rewritten — DV marks carry both ops
    assert(before.subsetOf(snap.active.map(_.path).toSet))
    assert(snap.active.exists(_.dv.isDefined))
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 29)
    assert(out.where(col("id") === 8L).head().getDouble(2) == 0.0)
  }

  test("applyCdcDv folds a change batch without rewriting target files") {
    val d = freshDir("cdc")
    LakeWriter.writeDelta(base.repartition(3), d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val before = DeltaReader.snapshot(spark, d, None).active.map(_.path).toSet
    // delete id 1, update id 2, insert 100, delete of absent 101 no-ops
    val changes = Seq(
      (1L, "a", 0.0, "delete"), (2L, "b", 222.0, "update_postimage"),
      (100L, "n", 9.0, "insert"), (101L, "x", 0.0, "delete")
    ).toDF("id", "k", "v", "_change_type")
    val touched = LakeWriter.applyCdcDv(spark, d, changes, Seq("id"))
    assert(touched.nonEmpty)
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(before.subsetOf(snap.active.map(_.path).toSet), "no target file rewritten")
    assert(snap.active.exists(a => a.path.contains("part-cdc-")))
    val out = DeltaReader.read(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(!out.contains(1L) && !out.contains(101L))
    assert(out(2L) == ("b", 222.0))
    assert(out(100L) == ("n", 9.0))
    assert(out.size == 30) // 30 - 1 deleted + 1 inserted
    // complete change data in the one commit
    val ch = DeltaReader.readChanges(spark, d, 1, 1)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L))
  }

  test("the streaming cdcApply sink goes merge-on-read on DV-declaring targets") {
    val src = freshDir("msrc"); val dst = freshDir("mdst"); val cp = freshDir("mcp")
    LakeWriter.writeDelta(base.repartition(2), src,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "id").option("cdcApply", "true")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    replicate() // first batch creates the replica (plain files)
    // declare DVs on the REPLICA: subsequent folds go merge-on-read
    LakeWriter.alterProperties(spark, dst,
      Map("delta.enableDeletionVectors" -> "true"))
    val filesBefore = DeltaReader.snapshot(spark, dst, None).active.map(_.path).toSet
    LakeWriter.deleteWhere(spark, src, "id % 5 = 0")
    LakeWriter.updateWhere(spark, src, "id = 7", Map("v" -> "777.0"))
    replicate()
    val snap = DeltaReader.snapshot(spark, dst, None)
    assert(filesBefore.subsetOf(snap.active.map(_.path).toSet),
      "MOR fold must not rewrite replica files")
    assert(snap.active.exists(_.dv.isDefined))
    // replica ≡ source
    val a = DeltaReader.read(spark, dst).orderBy("id").collect().map(_.toSeq).toSeq
    val b = DeltaReader.read(spark, src).orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("refusals and the no-match no-commit rule") {
    val d = freshDir("ref")
    LakeWriter.writeDelta(base, d)
    val v0 = DeltaReader.snapshot(spark, d, None).version
    assert(LakeWriter.updateWhereDv(spark, d, "id > 10000", Map("v" -> "0.0")).isEmpty)
    assert(DeltaReader.snapshot(spark, d, None).version == v0)
    // HALF-configured row tracking (feature declared, no watermark)
    // refuses — a fully-enabled table composes (DeltaRowTrackingSpec)
    val d2 = freshDir("rt")
    LakeWriter.writeDelta(base, d2)
    LakeWriter.upgradeProtocol(spark, d2, 1, 7,
      writerFeatures = Seq("rowTracking", "domainMetadata"))
    val e = intercept[IllegalArgumentException] {
      LakeWriter.updateWhereDv(spark, d2, "id = 1", Map("v" -> "0.0"))
    }
    assert(e.getMessage.contains("rowTracking"))
    // obligations still bind: a CHECK-violating new value refuses
    val d3 = freshDir("chk")
    LakeWriter.writeDelta(base, d3,
      configuration = Map("delta.constraints.v_pos" -> "v > 0"))
    val e2 = intercept[Exception] {
      LakeWriter.updateWhereDv(spark, d3, "id = 1", Map("v" -> "-5.0"))
    }
    assert(e2.getMessage.contains("v_pos"))
  }
}
