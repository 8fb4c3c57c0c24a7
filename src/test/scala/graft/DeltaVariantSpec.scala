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

  test("variantShredding: a genuinely SHREDDED foreign file reads through the declared VariantType") {
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val root = java.nio.file.Files.createTempDirectory("graft_vshred_").toFile
    val log = new java.io.File(root, "_delta_log"); log.mkdirs()
    // write a SHREDDED parquet file with Spark's own writer (the
    // foreign-engine stand-in): typed_value groups in the footer
    val keys = Seq("spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "true"))
    try {
      val stage = new java.io.File(root, "_stage")
      spark.sql(
        """SELECT id, parse_json(concat('{"a":', id, ',"b":"s', id, '"}')) AS v
          |FROM range(6)""".stripMargin)
        .coalesce(1).write.parquet(stage.getPath)
      val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(pf.toPath,
        new java.io.File(root, "shredded.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // prove the fixture is really shredded, not a plain binary pair
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(root.getPath, "shredded.parquet"),
        spark.sessionState.newHadoopConf()))
    val footer = try rdr.getFooter.getFileMetaData.getSchema.toString
      finally rdr.close()
    assert(footer.contains("typed_value"), s"fixture is not shredded:\n$footer")
    // the foreign table declares BOTH variant features
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.VariantType)))
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType","variantShredding"],"writerFeatures":["variantType","variantShredding"]}}""",
      s"""{"metaData":{"id":"vshred","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}""",
      """{"add":{"path":"shredded.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    ).mkString("\n").getBytes("UTF-8"))
    val dir = root.getPath
    def got() = DeltaReader.read(spark, dir)
      .selectExpr("id", "variant_get(v, '$.a', 'long') AS a",
        "variant_get(v, '$.b', 'string') AS b")
      .as[(Long, Long, String)].collect().toSet
    assert(got() == (0L until 6L).map(i => (i, i, s"s$i")).toSet, got().toString)
    // graft writes stay UNSHREDDED (legal under the feature — shredding
    // is a MAY): an append lands beside the shredded file and both read
    LakeWriter.appendDelta(spark.sql(
      """SELECT id, parse_json(concat('{"a":', id, ',"b":"s', id, '"}')) AS v
        |FROM range(100, 102)""".stripMargin).coalesce(1), dir)
    assert(got() == ((0L until 6L) ++ (100L until 102L))
      .map(i => (i, i, s"s$i")).toSet, got().toString)
    // and a rewrite (OPTIMIZE) folds the shredded file into an
    // unshredded one without changing a value
    LakeWriter.compactDelta(spark, dir, minFiles = 2)
    assert(got() == ((0L until 6L) ++ (100L until 102L))
      .map(i => (i, i, s"s$i")).toSet, got().toString)
    assert(DeltaReader.snapshot(spark, dir, None).active
      .forall(!_.path.contains("shredded")), "compaction folded the foreign file")
  }
}
