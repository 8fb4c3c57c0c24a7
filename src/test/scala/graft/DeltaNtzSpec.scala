package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** TIMESTAMP_NTZ columns — the protocol's `timestampNtz` reader+writer
  * feature: the parquet encoding is isAdjustedToUTC=false, and a
  * feature-unaware reader would shift every wall-clock value to a UTC
  * instant, so ANY path that introduces the type (create, evolution,
  * ALTER ADD COLUMNS, date→NTZ widening, CONVERT, CM create) must gate
  * it behind minReader 3 in the same commit.
  */
class DeltaNtzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ntz_$tag").resolve("t")
      .toAbsolutePath.toString

  private def ntzDf(n: Int) = spark.range(n).toDF("id")
    .withColumn("ts", expr("timestampadd(HOUR, cast(id AS int), " +
      "cast('2024-03-01T06:30:00' AS timestamp_ntz))"))

  test("create with NTZ declares (3,7)+timestampNtz; wall-clock round-trip") {
    val dir = tmp("rt")
    LakeWriter.writeDelta(ntzDf(5), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.minReader == 3 && snap.minWriter == 7)
    assert(snap.readerFeatures.contains("timestampNtz") &&
      snap.writerFeatures.contains("timestampNtz"))
    val back = DeltaReader.read(spark, dir)
    assert(back.schema("ts").dataType == TimestampNTZType)
    val got = back.select(date_format($"ts", "yyyy-MM-dd HH:mm").as("s"))
      .as[String].collect().toSet
    assert(got == (0 until 5).map(h => f"2024-03-01 ${6 + h}%02d:30").toSet, got)
  }

  test("NTZ-free schemas stay on the legacy protocol") {
    val dir = tmp("plain")
    LakeWriter.writeDelta(spark.range(3).toDF("k"), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.minReader == 1 && !snap.writerFeatures.contains("timestampNtz"))
  }

  test("appends, DELETE, OPTIMIZE and time travel pass through NTZ tables") {
    val dir = tmp("mut")
    LakeWriter.writeDelta(ntzDf(4).repartition(2), dir)
    LakeWriter.appendDelta(ntzDf(8).where($"id" >= 4).repartition(2), dir)
    LakeWriter.deleteWhere(spark, dir, "id = 5")
    LakeWriter.compactDelta(spark, dir, minFiles = 1)
    val got = DeltaReader.read(spark, dir).select($"id").as[Long].collect().toSet
    assert(got == (0L until 8L).toSet - 5L)
    assert(DeltaReader.read(spark, dir, versionAsOf = Some(0L)).count() == 4L)
  }

  test("evolution and ALTER ADD COLUMNS introducing NTZ upgrade in the same commit") {
    val evo = tmp("evo")
    LakeWriter.writeDelta(spark.range(3).toDF("k"), evo)
    assert(DeltaReader.snapshot(spark, evo, None).minReader == 1)
    LakeWriter.appendDeltaEvolve(spark.range(3, 6).toDF("k")
      .withColumn("seen", expr("cast('2024-01-02T03:04:05' AS timestamp_ntz)")), evo)
    val se = DeltaReader.snapshot(spark, evo, None)
    assert(se.minReader == 3 && se.readerFeatures.contains("timestampNtz"))
    assert(DeltaReader.read(spark, evo).where($"seen".isNull).count() == 3L)

    val alt = tmp("alt")
    LakeWriter.writeDelta(spark.range(2).toDF("k"), alt)
    LakeWriter.alterAddColumns(spark, alt, Seq("noted" -> "timestamp_ntz"))
    val sa = DeltaReader.snapshot(spark, alt, None)
    assert(sa.minReader == 3 && sa.readerFeatures.contains("timestampNtz") &&
      sa.writerFeatures.contains("timestampNtz"))
  }

  test("date→NTZ widening declares typeWidening AND timestampNtz together") {
    val dir = tmp("widen")
    LakeWriter.writeDelta(spark.range(3).toDF("k")
      .withColumn("d", expr("date_add(date'2024-05-01', cast(k AS int))")), dir)
    LakeWriter.widenColumnType(spark, dir, "d", TimestampNTZType)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.readerFeatures.toSet.intersect(Set("typeWidening", "timestampNtz"))
      == Set("typeWidening", "timestampNtz"), snap.readerFeatures.toString)
    val got = DeltaReader.read(spark, dir)
      .select(date_format($"d", "yyyy-MM-dd HH:mm").as("s")).as[String]
      .collect().toSet
    assert(got == Set("2024-05-01 00:00", "2024-05-02 00:00", "2024-05-03 00:00"))
  }

  test("CM create and CONVERT TO DELTA with NTZ declare the feature") {
    val cm = tmp("cm")
    LakeWriter.writeDeltaMapped(ntzDf(3), cm)
    val sc = DeltaReader.snapshot(spark, cm, None)
    assert(sc.minReader == 3 && sc.minWriter == 7)
    assert(sc.readerFeatures.toSet == Set("columnMapping", "timestampNtz"),
      sc.readerFeatures.toString)
    assert(DeltaReader.read(spark, cm).select($"id").as[Long].collect().toSet
      == Set(0L, 1L, 2L))

    val conv = tmp("conv")
    ntzDf(4).write.parquet(conv)
    LakeWriter.convertToDelta(spark, conv)
    val sv = DeltaReader.snapshot(spark, conv, None)
    assert(sv.minReader == 3 && sv.readerFeatures.contains("timestampNtz"))
    assert(DeltaReader.read(spark, conv).count() == 4L)
  }

  test("DROP FEATURE: refused while an NTZ column remains; clean after declaration-only") {
    val live = tmp("droplive")
    LakeWriter.writeDelta(ntzDf(2), live)
    val e = intercept[IllegalArgumentException] {
      LakeWriter.dropFeature(spark, live, "timestampNtz", truncateHistory = true)
    }
    assert(e.getMessage.contains("TIMESTAMP_NTZ column"), e.getMessage)

    val decl = tmp("dropdecl")
    LakeWriter.writeDelta(spark.range(2).toDF("k"), decl)
    LakeWriter.upgradeProtocol(spark, decl, 3, 7,
      readerFeatures = Seq("timestampNtz"),
      writerFeatures = Seq("appendOnly", "invariants", "timestampNtz"))
    LakeWriter.dropFeature(spark, decl, "timestampNtz", truncateHistory = true)
    val sd = DeltaReader.snapshot(spark, decl, None)
    assert(!sd.readerFeatures.contains("timestampNtz") &&
      !sd.writerFeatures.contains("timestampNtz"))
    assert(DeltaReader.read(spark, decl).count() == 2L)
  }
}
