package graft

import graft.sources.{DeltaReader, LakeWriter}
import graft.text.TextAnalysis

/** GENERATE symlink_format_manifest and the PII signal battery. */
class ManifestPiiSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def readManifest(dir: String, rel: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, "_symlink_format_manifest", rel)
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.split("\n").toSeq
  }

  test("manifest lists exactly the live files and tracks mutations") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_manifest_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)

    val written = LakeWriter.generateManifest(spark, dir)
    assert(written == Seq("manifest"))
    val lines = readManifest(dir, "manifest")
    val live = DeltaReader.snapshot(spark, dir, None).active.map(_.path).toSet
    assert(lines.size == live.size && lines.forall(u => u.startsWith("file:")))
    assert(live.forall(p => lines.exists(_.endsWith(p))))

    // a delete rewrites a file: the regenerated manifest must point at
    // the survivors only
    LakeWriter.deleteWhere(spark, dir, "id = 0")
    LakeWriter.generateManifest(spark, dir)
    val after = readManifest(dir, "manifest")
    val liveAfter = DeltaReader.snapshot(spark, dir, None).active.map(_.path).toSet
    assert(after.size == liveAfter.size)
    assert(liveAfter.forall(p => after.exists(_.endsWith(p))))
    assert(!after.exists(u => live.diff(liveAfter).exists(u.endsWith)))
  }

  test("partitioned manifest: one file per partition dir; stale dirs removed") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_manifest_part_")
    LakeWriter.writeDelta(Seq((0L, "a", "w"), (1L, "b", "e")).toDF("id", "v", "r"),
      dir, partitionBy = Seq("r"))
    val written = LakeWriter.generateManifest(spark, dir)
    assert(written == Seq("r=e/manifest", "r=w/manifest"))
    assert(readManifest(dir, "r=w/manifest").forall(_.contains("r=w/")))

    // delete everything in r=w: the stale partition manifest must go
    LakeWriter.deleteWhere(spark, dir, "r = 'w'")
    val w2 = LakeWriter.generateManifest(spark, dir)
    assert(w2 == Seq("r=e/manifest"))
    assert(!new java.io.File(dir, "_symlink_format_manifest/r=w").exists())
  }

  test("manifest refuses DV snapshots and column-mapped tables") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_manifest_dv_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.deleteWhereDv(spark, dir, "id = 0")
    val e = intercept[IllegalArgumentException](LakeWriter.generateManifest(spark, dir))
    assert(e.getMessage.contains("deletion vectors"))
    // compaction folds the DV away; the manifest generates afterwards
    LakeWriter.compactDelta(spark, dir, minFiles = 1)
    assert(LakeWriter.generateManifest(spark, dir).nonEmpty)

    val cm = tmp("graft_manifest_cm_")
    LakeWriter.writeDeltaMapped(Seq((0L, "a")).toDF("id", "v"), cm)
    val e2 = intercept[IllegalArgumentException](LakeWriter.generateManifest(spark, cm))
    assert(e2.getMessage.contains("column-mapped"))
  }

  test("pii signals count and mask emails, urls, ips and digit runs in layer order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "mail bob.smith+x@example.org and visit https://ex.org/a?q=1 now"),
      (2L, "server 10.0.255.3 logged card 1234567890 twice: 999999"),
      (3L, "clean text with no signals at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getString(5))).toMap
    assert(got(1L)._1 == ((1L, 1L, 0L, 0L)))
    // the email is ONE mask, its digits never shredded into <NUM>
    assert(got(1L)._2 == "mail <EMAIL> and visit <URL> now")
    assert(got(2L)._1 == ((0L, 0L, 1L, 2L)))
    assert(got(2L)._2 == "server <IP> logged card <NUM> twice: <NUM>")
    assert(got(3L)._1 == ((0L, 0L, 0L, 0L)))
    assert(got(3L)._2 == "clean text with no signals at all")
  }
}
