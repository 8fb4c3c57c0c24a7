package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._

/** VARIANT columns — the protocol's `variantType` reader+writer
  * feature: semi-structured values as a first-class column type,
  * written/read natively through Spark 4's variant encoding. Creating
  * or evolving a variant column declares the (3,7) feature form;
  * mutations pass through; `variant_get` extracts typed paths.
  */
class DeltaVariantSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_variant_$tag").resolve("t")
      .toAbsolutePath.toString

  test("create with variant declares (3,7)+variantType; round-trip and typed extraction") {
    val dir = tmp("rt")
    val df = spark.sql(
      """SELECT id, parse_json(concat('{"a":', id, ',"tags":["x","y"]}')) AS v
        |FROM range(5)""".stripMargin)
    LakeWriter.writeDelta(df, dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.minReader == 3 && snap.minWriter == 7)
    assert(snap.readerFeatures.contains("variantType") &&
      snap.writerFeatures.contains("variantType"))
    val back = DeltaReader.read(spark, dir)
    assert(back.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = back.selectExpr("id", "variant_get(v, '$.a', 'long') AS a",
      "variant_get(v, '$.tags[1]', 'string') AS t")
      .as[(Long, Long, String)].collect().toSet
    assert(got == (0L until 5L).map(i => (i, i, "y")).toSet, got.toString)
  }

  test("appends, DELETE and OPTIMIZE pass through variant tables") {
    val dir = tmp("mut")
    LakeWriter.writeDelta(spark.sql(
      """SELECT id AS k, parse_json(concat('{"n":', id * 10, '}')) AS v
        |FROM range(4)""".stripMargin).repartition(2), dir)
    LakeWriter.appendDelta(spark.sql(
      """SELECT id AS k, parse_json(concat('{"n":', id * 10, '}')) AS v
        |FROM range(4, 8)""".stripMargin).repartition(2), dir)
    LakeWriter.deleteWhere(spark, dir, "k = 5")
    LakeWriter.compactDelta(spark, dir, minFiles = 1)
    val got = DeltaReader.read(spark, dir)
      .selectExpr("k", "variant_get(v, '$.n', 'long')").as[(Long, Long)]
      .collect().toSet
    assert(got == (0L until 8L).filterNot(_ == 5L).map(i => (i, i * 10)).toSet)
  }

  test("schema evolution introducing variant upgrades the protocol in the same commit") {
    val dir = tmp("evo")
    LakeWriter.writeDelta(spark.range(0, 3).toDF("k"), dir)
    val pre = DeltaReader.snapshot(spark, dir, None)
    assert(!pre.readerFeatures.contains("variantType") && pre.minReader == 1)
    LakeWriter.appendDeltaEvolve(spark.sql(
      """SELECT id AS k, parse_json(concat('{"b":', id, '}')) AS v
        |FROM range(3, 6)""".stripMargin), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.version == pre.version + 1)
    assert(snap.minReader == 3 && snap.readerFeatures.contains("variantType") &&
      snap.writerFeatures.contains("variantType"))
    // old rows null-fill the variant; new rows extract
    val got = DeltaReader.read(spark, dir)
      .selectExpr("k", "variant_get(v, '$.b', 'long')").as[(Long, Option[Long])]
      .collect().toSet
    assert(got == ((0L until 3L).map(i => (i, None)) ++
      (3L until 6L).map(i => (i, Some(i)))).toSet, got.toString)
    // ALTER ADD COLUMNS with a variant column also upgrades
    val dir2 = tmp("alter")
    LakeWriter.writeDelta(spark.range(0, 2).toDF("k"), dir2)
    LakeWriter.alterAddColumns(spark, dir2, Seq("payload" -> "variant"))
    val snap2 = DeltaReader.snapshot(spark, dir2, None)
    assert(snap2.readerFeatures.contains("variantType"), snap2.readerFeatures.toString)
    assert(DeltaReader.read(spark, dir2).schema("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
  }
}
