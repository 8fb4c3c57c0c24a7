package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._

/** REORG TABLE ... APPLY (PURGE) + ALTER TABLE ... DROP FEATURE — the
  * protocol DOWNGRADE path: materialize deletion-vector debt into
  * clean files (cost ∝ DV'd files), then restate the protocol without
  * the feature once no trace remains; clustering drop removes the
  * domain; everything else refuses loudly.
  */
class DeltaReorgSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t")
      .toAbsolutePath.toString

  private def vals(dir: String): Set[Long] =
    DeltaReader.read(spark, dir).select("id").as[Long].collect().toSet

  test("REORG APPLY (PURGE) rewrites ONLY DV'd files, keeps rows, drops descriptors") {
    val dir = tmp("graft_reorg_")
    LakeWriter.writeDelta(spark.range(0, 100).toDF("id").repartition(4), dir)
    LakeWriter.deleteWhereDv(spark, dir, "id % 10 = 3")
    val snap0 = DeltaReader.snapshot(spark, dir, None)
    val dvd = snap0.active.filter(_.dv.nonEmpty).map(_.path).toSet
    val clean = snap0.active.filter(_.dv.isEmpty).map(_.path).toSet
    assert(dvd.nonEmpty, "harness: the DV delete marked no file")
    spark.sql(s"REORG TABLE graft_delta.`$dir` APPLY (PURGE)")
    val snap1 = DeltaReader.snapshot(spark, dir, None)
    assert(snap1.active.forall(_.dv.isEmpty), "a DV survived the purge")
    // untouched files stay; DV'd ones were replaced
    assert(clean.subsetOf(snap1.active.map(_.path).toSet))
    assert(snap1.active.map(_.path).toSet.intersect(dvd).isEmpty)
    assert(vals(dir) == (0L until 100L).filterNot(_ % 10 == 3).toSet)
    // purge is a no-op (no commit) when nothing carries a DV
    LakeWriter.reorgPurge(spark, dir)
    assert(DeltaReader.snapshot(spark, dir, None).version == snap1.version)
  }

  test("REORG WHERE scopes the purge to matching partitions") {
    val dir = tmp("graft_reorgw_")
    LakeWriter.writeDelta(spark.range(0, 100)
      .select(col("id"), (col("id") % 2).cast("string").as("p")).toDF(), dir,
      partitionBy = Seq("p"))
    LakeWriter.deleteWhereDv(spark, dir, "id % 10 = 7") // DVs in both partitions
    spark.sql(s"REORG TABLE graft_delta.`$dir` WHERE p = '0' APPLY (PURGE)")
    val snap = DeltaReader.snapshot(spark, dir, None)
    val withDv = snap.active.filter(_.dv.nonEmpty).map(_.partitionValues("p")).toSet
    assert(withDv == Set("1"), s"purge scope leaked: DVs remain in $withDv")
    assert(vals(dir) == (0L until 100L).filterNot(_ % 10 == 7).toSet)
  }

  test("DROP FEATURE deletionVectors: refusals first, then downgrade with checkpoint") {
    val dir = tmp("graft_dropdv_")
    LakeWriter.writeDelta(spark.range(0, 50).toDF("id").repartition(2), dir,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    LakeWriter.deleteWhereDv(spark, dir, "id = 7")
    // trace present → refuse
    val e1 = intercept[IllegalArgumentException] {
      LakeWriter.dropFeature(spark, dir, "deletionVectors", truncateHistory = true)
    }
    assert(e1.getMessage.contains("REORG"), e1.getMessage)
    LakeWriter.reorgPurge(spark, dir)
    // reader feature → TRUNCATE HISTORY required
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_delta.`$dir` DROP FEATURE deletionVectors")
    }
    assert(e2.getMessage.contains("TRUNCATE HISTORY"), e2.getMessage)
    spark.sql(
      s"ALTER TABLE graft_delta.`$dir` DROP FEATURE deletionVectors TRUNCATE HISTORY")
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(!snap.writerFeatures.contains("deletionVectors") &&
      !snap.readerFeatures.contains("deletionVectors"),
      s"features: r=${snap.readerFeatures} w=${snap.writerFeatures}")
    assert(snap.minReader == 1, s"minReader ${snap.minReader}")
    assert(!snap.configuration.contains("delta.enableDeletionVectors"))
    // the truncate-history stand-in: a checkpoint AT the drop version
    val cp = new java.io.File(s"$dir/_delta_log")
      .listFiles().map(_.getName).filter(_.contains("checkpoint"))
    assert(cp.exists(_.startsWith(f"${snap.version}%020d.checkpoint")), cp.mkString(","))
    // post-drop: SQL DELETE routes copy-on-write and still works
    spark.sql(s"DELETE FROM graft_delta.`$dir` WHERE id = 8")
    assert(vals(dir) == (0L until 50L).filterNot(i => i == 7 || i == 8).toSet)
    assert(DeltaReader.snapshot(spark, dir, None).active.forall(_.dv.isEmpty))
    // history below the drop stays readable to graft (DVs understood)
    assert(DeltaReader.read(spark, dir, versionAsOf = Some(1L)).count() == 49)
  }

  test("checkpointProtection: TRUNCATE HISTORY stamps the boundary; from-JSON replay across it refuses") {
    val dir = tmp("graft_cpprot_")
    LakeWriter.writeDelta(spark.range(0, 30).toDF("id").repartition(2), dir,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    LakeWriter.deleteWhereDv(spark, dir, "id = 3")
    LakeWriter.reorgPurge(spark, dir)
    LakeWriter.dropFeature(spark, dir, "deletionVectors", truncateHistory = true)
    val snap = DeltaReader.snapshot(spark, dir, None)
    val bound = snap.version
    assert(snap.writerFeatures.contains("checkpointProtection"),
      snap.writerFeatures.toString)
    assert(snap.configuration(
      "delta.requireCheckpointProtectionBeforeVersion").toLong == bound)
    // checkpoint replay works (the drop authored one AT the boundary)
    assert(DeltaReader.read(spark, dir).count() == 29)
    // the feature binds checkpoints and cleanup, not rows — appends run
    LakeWriter.appendDelta(spark.range(100, 102).toDF("id"), dir)
    assert(DeltaReader.read(spark, dir).count() == 31)
    // graft never authors a checkpoint BELOW the boundary
    val eCp = intercept[IllegalArgumentException](
      LakeWriter.checkpointDelta(spark, dir, bound - 1))
    assert(eCp.getMessage.contains("protection boundary"), eCp.getMessage)
    // the v2 author is public API too — the same gate binds a direct call
    val eCp2 = intercept[IllegalArgumentException](
      LakeWriter.checkpointDeltaV2(spark, dir, bound - 1))
    assert(eCp2.getMessage.contains("protection boundary"), eCp2.getMessage)
    // delete every checkpoint: a from-version-0 JSON replay to the
    // LATEST must refuse loudly instead of silently crossing the
    // dropped feature's history (the r16 documented deviation, closed)
    val log = new java.io.File(s"$dir/_delta_log")
    log.listFiles().filter(_.getName.contains("checkpoint")).foreach(_.delete())
    new java.io.File(log, "_last_checkpoint").delete()
    val eRead = intercept[IllegalArgumentException](
      DeltaReader.read(spark, dir).count())
    assert(eRead.getMessage.contains("checkpoint protection boundary"),
      eRead.getMessage)
    // time travel BELOW the boundary still reads: that region's
    // protocol actions declare its features and gate as usual
    assert(DeltaReader.read(spark, dir, Some(1L)).count() == 29)
    // repair recipe from the refusal message: re-author the boundary
    // checkpoint under the override flag, then unset it
    spark.conf.set("spark.graft.delta.ignoreCheckpointProtection", "true")
    try LakeWriter.checkpointDelta(spark, dir,
      DeltaReader.snapshot(spark, dir, None).version)
    finally spark.conf.unset("spark.graft.delta.ignoreCheckpointProtection")
    assert(DeltaReader.read(spark, dir).count() == 31)
    // FOREIGN shape: a table that merely DECLARES the writer feature
    // reads and appends (its obligations bind checkpoint authoring)
    val f = tmp("graft_cpprot_f_")
    LakeWriter.writeDelta(spark.range(0, 5).toDF("id"), f)
    LakeWriter.upgradeProtocol(spark, f, 1, 7,
      writerFeatures = Seq("checkpointProtection"))
    assert(DeltaReader.read(spark, f).count() == 5)
    LakeWriter.appendDelta(spark.range(5, 7).toDF("id"), f)
    assert(DeltaReader.read(spark, f).count() == 7)
  }

  test("DROP FEATURE clustering removes the domain; unknown features refuse") {
    val dir = tmp("graft_dropcl_")
    LakeWriter.writeDelta(spark.range(0, 10).toDF("id"), dir)
    LakeWriter.clusterBy(spark, dir, Seq("id"))
    spark.sql(s"ALTER TABLE graft_delta.`$dir` DROP FEATURE clustering")
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(!snap.writerFeatures.contains("clustering"))
    assert(!snap.domainMetadata.contains("delta.clustering"))
    // domainMetadata itself survives (other owners may use it)
    assert(snap.writerFeatures.contains("domainMetadata"))
    val e = intercept[IllegalArgumentException] {
      LakeWriter.dropFeature(spark, dir, "domainMetadata")
    }
    assert(e.getMessage.contains("not droppable"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.dropFeature(spark, dir, "clustering")
    }
    assert(e2.getMessage.contains("does not declare"), e2.getMessage)
  }
}
