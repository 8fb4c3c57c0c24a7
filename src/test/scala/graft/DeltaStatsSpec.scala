package graft

import graft.sources.{DeltaReader, DeltaStats, LakeWriter}

/** File statistics (add.stats) + data skipping: footer-derived stats
  * land in every add action, survive checkpoint replay, and the
  * pruner keeps exactly the files a predicate may match — never
  * dropping a matching one (soundness re-checked by equality against
  * the unpruned read).
  */
class DeltaStatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  /** A 4-file table with tight disjoint id ranges per file. */
  private def rangedTable(dir: String): Unit = {
    val s = spark
    import s.implicits._
    val df = s.range(400).selectExpr("id", "concat('v', id) AS v",
      "CASE WHEN id % 100 = 0 THEN NULL ELSE CAST(id AS DOUBLE) END AS w")
    LakeWriter.writeDelta(df.repartitionByRange(4, org.apache.spark.sql.functions.col("id")), dir)
  }

  test("writeDelta emits footer stats; checkpoint replay preserves them") {
    val dir = tmp("graft_stats_")
    rangedTable(dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.size == 4)
    snap.active.foreach { a =>
      assert(a.stats.isDefined, s"add ${a.path} carries no stats")
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(a.stats.get)
      assert(n.get("numRecords").asLong() == 100L)
      assert(n.get("minValues").has("id") && n.get("maxValues").has("id"))
      assert(n.get("minValues").has("v"), "string stats missing")
      assert(n.get("nullCount").has("w"))
      // each file's id envelope is tight (disjoint 100-row ranges)
      assert(n.get("maxValues").get("id").asLong() -
        n.get("minValues").get("id").asLong() < 100L)
    }
    // nullCount: exactly one NULL w per 100-row file (id % 100 == 0)
    assert(snap.active.map(a => new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(a.stats.get).get("nullCount").get("w").asLong()).sum == 4L)

    LakeWriter.checkpointDelta(spark, dir, 0L)
    // force replay THROUGH the checkpoint by cleaning the commit json
    val v0 = new java.io.File(dir, "_delta_log/" + "0" * 20 + ".json")
    assert(v0.delete())
    val replayed = DeltaReader.snapshot(spark, dir, None)
    assert(replayed.active.forall(_.stats.isDefined),
      "stats lost through checkpoint replay")
  }

  test("prune keeps only envelope-compatible files; readWhere equals read().where") {
    val dir = tmp("graft_stats_prune_")
    rangedTable(dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    // a narrow id predicate keeps one file
    assert(DeltaStats.prune(spark, snap.active, "id >= 110 AND id < 160", snap).size == 1)
    // an impossible predicate keeps none
    assert(DeltaStats.prune(spark, snap.active, "id > 10000", snap).isEmpty)
    // equality inside one range keeps that file only
    assert(DeltaStats.prune(spark, snap.active, "id = 250", snap).size == 1)
    // IN across two ranges keeps two
    assert(DeltaStats.prune(spark, snap.active, "id IN (50, 350)", snap).size == 2)
    // IS NULL on w keeps all (each file holds one null); IS NULL on id none
    assert(DeltaStats.prune(spark, snap.active, "w IS NULL", snap).size == 4)
    assert(DeltaStats.prune(spark, snap.active, "id IS NULL", snap).isEmpty)
    // an unsupported shape is conservative
    assert(DeltaStats.prune(spark, snap.active, "id % 7 = 3", snap).size == 4)
    // OR composition
    assert(DeltaStats.prune(spark, snap.active, "id < 50 OR id >= 390", snap).size == 2)
    // soundness end-to-end: pruned read ≡ unpruned filtered read
    val s = spark
    import s.implicits._
    val a = DeltaReader.readWhere(spark, dir, "id >= 95 AND id < 210 AND v <> 'v100'")
      .select("id").as[Long].collect().toSet
    val b = DeltaReader.read(spark, dir).where("id >= 95 AND id < 210 AND v <> 'v100'")
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("partition values prune through the same evaluator") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_stats_pv_")
    LakeWriter.writeDelta(
      Seq((0L, "x"), (1L, "x"), (2L, "y")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val snap = DeltaReader.snapshot(spark, dir, None)
    val kept = DeltaStats.prune(spark, snap.active, "p = 'x' AND id >= 1", snap)
    assert(kept.forall(_.partitionValues.get("p").contains("x")))
    assert(DeltaStats.prune(spark, snap.active, "p = 'z'", snap).isEmpty)
  }

  test("mutations stay exact under pruning and string stats stay conservative on non-ASCII") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_stats_mut_")
    rangedTable(dir)
    // a narrow delete touches (and rewrites) exactly one file
    val removed = LakeWriter.deleteWhere(spark, dir, "id >= 110 AND id < 160")
    assert(removed.size == 1)
    assert(DeltaReader.read(spark, dir).count() == 350L)
    // the rewritten file's NEW add carries fresh stats too
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.forall(_.stats.isDefined))

    // non-ASCII strings prune in code-point order: 'zzz' sorts BELOW
    // the file's ['ábc', 'żółw'] envelope (z = U+007A < á = U+00E1),
    // so the file skips — while a value inside the envelope keeps it
    val dir2 = tmp("graft_stats_uni_")
    LakeWriter.writeDelta(Seq((0L, "żółw"), (1L, "ábc")).toDF("id", "v")
      .coalesce(1), dir2)
    val snap2 = DeltaReader.snapshot(spark, dir2, None)
    assert(DeltaStats.prune(spark, snap2.active, "v = 'zzz'", snap2).isEmpty)
    assert(DeltaStats.prune(spark, snap2.active, "v = 'émil'", snap2).size == 1)
    assert(DeltaReader.readWhere(spark, dir2, "v = 'zzz'").count() ==
      DeltaReader.read(spark, dir2).where("v = 'zzz'").count())
  }
}
