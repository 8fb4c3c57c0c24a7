package graft

import graft.sources.LakeWriter
import graft.streaming.ViewMaintain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance ≡ full aggregation, across the whole
  * mutation surface, with crash-replay idempotence.
  */
class ViewMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ivm_$tag").resolve("t")
      .toAbsolutePath.toString

  private def fullAgg(dir: String): Seq[(String, BigDecimal, Long)] =
    graft.sources.DeltaReader.read(spark, dir)
      .groupBy("k").agg(sum(col("v").cast("decimal(18,2)")).as("s"), count(lit(1)).as("c"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1)), r.getLong(2))).toSeq

  private def view(state: String): Seq[(String, BigDecimal, Long)] =
    ViewMaintain.readView(spark, state).orderBy("k").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1)), r.getLong(2))).toSeq

  private def base: DataFrame =
    (1 to 60).map(i => (i.toLong, Seq("a", "b", "c")(i % 3), i * 1.5)).toDF("id", "k", "v")

  test("view tracks update / delete-whole-key / append / merge without rescans") {
    val d = freshDir("t")
    val st = freshDir("s")
    LakeWriter.writeDelta(base.repartition(3), d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    assert(view(st) == fullAgg(d))
    assert(ViewMaintain.maintainedVersion(spark, st).contains(0L))

    LakeWriter.updateWhere(spark, d, "k = 'a'", Map("v" -> "v * 3"))
    LakeWriter.deleteWhere(spark, d, "k = 'b'") // whole group vanishes
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    assert(view(st) == fullAgg(d))
    assert(!view(st).exists(_._1 == "b"), "zero-count group must drop from the view")

    LakeWriter.appendDelta(
      (100 to 120).map(i => (i.toLong, "d", i * 0.25)).toDF("id", "k", "v"), d)
    LakeWriter.mergeInto(spark, d,
      (50 to 55).map(i => (i.toLong, "c", 999.0)).toDF("id", "k", "v"), Seq("id"))
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    assert(view(st) == fullAgg(d))
    // no further changes -> no step
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 0)
  }

  test("view maintains across a column-mapping REMOVAL in one catch-up window") {
    val d = freshDir("cmrm")
    val st = freshDir("cmrms")
    LakeWriter.writeDeltaMapped(base.repartition(3), d)               // v0, physical names
    LakeWriter.alterProperties(spark, d,
      Map("delta.enableChangeDataFeed" -> "true"))                    // v1
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    // the catch-up window v2..v4 crosses the removal: v2's cdc files
    // are keyed by the OLD physical names — the split form reads each
    // version under its own metadata instead of stranding the view
    // behind the batch refusal
    LakeWriter.updateWhere(spark, d, "k = 'a'", Map("v" -> "v * 2"))  // v2
    LakeWriter.removeColumnMapping(spark, d)                          // v3
    LakeWriter.appendDelta(
      (200 to 205).map(i => (i.toLong, "e", 2.0)).toDF("id", "k", "v"), d) // v4
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    assert(view(st) == fullAgg(d))
  }

  test("crash replay: re-applying the same change window is a no-op") {
    val d = freshDir("t")
    val st = freshDir("s")
    LakeWriter.writeDelta(base, d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    ViewMaintain.maintain(spark, d, st, Seq("k"), col("v"))
    LakeWriter.deleteWhere(spark, d, "id % 2 = 0")
    ViewMaintain.maintain(spark, d, st, Seq("k"), col("v"))
    val expected = view(st)
    // reconstruct the exact torn state a crash between state write and
    // watermark rename leaves (GC runs only AFTER the rename, so the
    // old state_v0 dir is still present at the crash point): state_v1
    // fully written + state_v0 intact + watermark at 0. Replaying must
    // overwrite state_v1 with the same content, not double-apply.
    val wm = new org.apache.hadoop.fs.Path(st, "ivm_version")
    val fs = wm.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(wm, true)
    out.write("0".getBytes("UTF-8")); out.close()
    val v0 = graft.sources.DeltaReader.read(spark, d, versionAsOf = Some(0L))
      .groupBy("k").agg(sum(col("v").cast("decimal(18,2)")).cast("decimal(28,2)").as("view_sum"),
        count(lit(1)).as("view_cnt"))
    v0.write.mode("overwrite").parquet(s"$st/state_v0")
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    assert(view(st) == expected, "replay must be idempotent")
    assert(view(st) == fullAgg(d))
  }

  test("missing watermark recovers from the newest completed state dir") {
    val d = freshDir("t")
    val st = freshDir("s")
    LakeWriter.writeDelta(base, d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    ViewMaintain.maintain(spark, d, st, Seq("k"), col("v"))
    LakeWriter.deleteWhere(spark, d, "id % 2 = 0")
    ViewMaintain.maintain(spark, d, st, Seq("k"), col("v"))
    val expected = view(st)
    // crash inside writeState's delete-then-rename fallback: watermark
    // file gone, state_v1 fully committed (_SUCCESS present)
    val wm = new org.apache.hadoop.fs.Path(st, "ivm_version")
    val fs = wm.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(wm, false)
    assert(ViewMaintain.maintainedVersion(spark, st).contains(1L),
      "watermark must recover from state_v1, not restart from scratch")
    assert(view(st) == expected)
    // a torn (no _SUCCESS) newer state dir must NOT win the recovery
    fs.delete(wm, false)
    fs.mkdirs(new org.apache.hadoop.fs.Path(st, "state_v9"))
    assert(ViewMaintain.maintainedVersion(spark, st).contains(1L),
      "recovery must ignore state dirs without a completed parquet commit")
    fs.delete(new org.apache.hadoop.fs.Path(st, "state_v9"), true)
    // and maintenance proceeds normally after recovery
    LakeWriter.appendDelta(
      (200 to 205).map(i => (i.toLong, "e", 1.0)).toDF("id", "k", "v"), d)
    assert(ViewMaintain.maintain(spark, d, st, Seq("k"), col("v")) == 1)
    assert(view(st) == fullAgg(d))
  }

  test("refuses to read an unmaintained view; unparseable watermark is loud") {
    val st = freshDir("s")
    val e = intercept[IllegalStateException](ViewMaintain.readView(spark, st))
    assert(e.getMessage.contains("no maintained view"))
    val wm = new org.apache.hadoop.fs.Path(st, "ivm_version")
    val fs = wm.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(wm, true); out.write("gar bage".getBytes("UTF-8")); out.close()
    val e2 = intercept[IllegalArgumentException](
      ViewMaintain.maintainedVersion(spark, st))
    assert(e2.getMessage.contains("unparseable watermark"))
  }
}
