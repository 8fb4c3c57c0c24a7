package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame

/** CONVERT TO DELTA (in-place parquet-dir conversion) and COPY INTO
  * (idempotent file-level ingestion).
  */
class DeltaConvertSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("convert a flat parquet dir in place: same rows, no file moved, mutable after") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_conv_")
    Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v").repartition(2).write
      .mode("append").parquet(dir)
    val filesBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    val n = LakeWriter.convertToDelta(spark, dir)
    assert(n == filesBefore.size)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    // in place: the same physical files, now log-referenced
    val filesAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(filesAfter == filesBefore)
    // the converted table is a first-class Delta table
    LakeWriter.appendDelta(Seq((3L, "d")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.deleteWhere(spark, dir, "id = 0")
    assert(rows(DeltaReader.read(spark, dir)) == Set((1L, "b"), (2L, "c"), (3L, "d")))
    // stats landed at convert time -> data skipping works immediately
    assert(rows(DeltaReader.readWhere(spark, dir, "id = 2")) == Set((2L, "c")))
  }

  test("convert a hive-partitioned dir: typed partition values, pruning, null marker") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_conv_part_") + "/t"
    Seq((0L, "a", "west coast"), (1L, "b", "east"), (2L, "c", null.asInstanceOf[String]))
      .toDF("id", "v", "region").write.partitionBy("region").parquet(dir)

    LakeWriter.convertToDelta(spark, dir, Seq("region" -> "string"))
    val got = DeltaReader.read(spark, dir)
    assert(got.columns.toSet == Set("id", "v", "region"))
    assert(rows(got) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    import org.apache.spark.sql.functions.col
    assert(got.where(col("region").isNull).count() == 1)
    assert(rows(DeltaReader.readPartition(spark, dir, Map("region" -> "west coast"))) ==
      Set((0L, "a")))
  }

  test("convert refuses an existing Delta table and a layout/declaration mismatch") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_conv_refuse_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v"), dir)
    val e = intercept[IllegalArgumentException](LakeWriter.convertToDelta(spark, dir))
    assert(e.getMessage.contains("already holds a Delta log"))

    val flat = tmp("graft_conv_refuse2_") + "/t"
    Seq((0L, "a")).toDF("id", "v").write.parquet(flat)
    val e2 = intercept[IllegalArgumentException](
      LakeWriter.convertToDelta(spark, flat, Seq("region" -> "string")))
    assert(e2.getMessage.contains("partition"))
  }

  test("copyInto loads each file exactly once across calls and retries") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_copy_")
    val land = tmp("graft_copy_land_")
    // parquet-roundtrip the seed so the table schema is nullable, like
    // every landing-zone file copyInto will append
    val seedDir = new java.io.File(land, "seed").getPath
    Seq((0L, "a")).toDF("id", "v").coalesce(1).write.parquet(seedDir)
    LakeWriter.writeDelta(spark.read.parquet(seedDir), dir)
    def landFile(name: String, r: Seq[(Long, String)]): String = {
      val sub = new java.io.File(land, name)
      r.toDF("id", "v").coalesce(1).write.parquet(sub.getPath)
      sub.listFiles().find(_.getName.endsWith(".parquet")).get.getPath
    }
    val f1 = landFile("f1", Seq((1L, "b")))
    val f2 = landFile("f2", Seq((2L, "c")))

    assert(LakeWriter.copyInto(spark, dir, Seq(f1)).size == 1)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b")))
    // retry with an overlapping set: only the new file loads
    assert(LakeWriter.copyInto(spark, dir, Seq(f1, f2)).size == 1)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b"), (2L, "c")))
    // full replay: nothing to do, NO commit written
    val vBefore = DeltaReader.snapshot(spark, dir, None).version
    assert(LakeWriter.copyInto(spark, dir, Seq(f1, f2)).isEmpty)
    assert(DeltaReader.snapshot(spark, dir, None).version == vBefore)
    // provenance rides the history
    val ops = DeltaReader.history(spark, dir).collect().map(_.getString(1)).toSeq
    assert(ops.count(_ == "COPY INTO") == 2)
  }

  test("copyInto honors the append discipline (schema mismatch refuses atomically)") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_copy_bad_")
    val land = tmp("graft_copy_bad_land_")
    val seedDir = new java.io.File(land, "seed").getPath
    Seq((0L, "a")).toDF("id", "v").coalesce(1).write.parquet(seedDir)
    LakeWriter.writeDelta(spark.read.parquet(seedDir), dir)
    val sub = new java.io.File(land, "bad")
    Seq((1, 2.5)).toDF("id", "other").coalesce(1).write.parquet(sub.getPath)
    val bad = sub.listFiles().find(_.getName.endsWith(".parquet")).get.getPath
    intercept[IllegalArgumentException](LakeWriter.copyInto(spark, dir, Seq(bad)))
    // the refused file is NOT recorded as loaded: fixing the schema
    // upstream and re-presenting the path must work
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a")))
    assert(DeltaReader.snapshot(spark, dir, None).version == 0L)
  }
}
