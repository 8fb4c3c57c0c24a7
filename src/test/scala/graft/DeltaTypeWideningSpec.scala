package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type widening — the protocol's `typeWidening` reader+writer
  * feature: ALTER COLUMN TYPE along the widening lattice is ONE
  * metadata commit (zero rewritten bytes at any table size); files
  * written before the change keep their narrow parquet type and read
  * up-cast through the declared schema; `delta.typeChanges` records
  * every hop.
  */
class DeltaTypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_widen_$tag").resolve("t")
      .toAbsolutePath.toString

  private def schemaOf(dir: String): StructType =
    DataType.fromJson(DeltaReader.snapshot(spark, dir, None).schemaJson)
      .asInstanceOf[StructType]

  test("int→long: old narrow files and new wide files read together; one metadata commit") {
    val dir = tmp("i2l")
    LakeWriter.writeDelta(spark.range(0, 10)
      .select(col("id").cast("int").as("a"), col("id").as("k")).toDF(), dir)
    val v0 = DeltaReader.snapshot(spark, dir, None)
    LakeWriter.widenColumnType(spark, dir, "a", LongType)
    val snap = DeltaReader.snapshot(spark, dir, None)
    // metadata-only: same files, one more version
    assert(snap.version == v0.version + 1)
    assert(snap.active.map(_.path).toSet == v0.active.map(_.path).toSet)
    assert(schemaOf(dir)("a").dataType == LongType)
    assert(snap.minReader == 3 && snap.readerFeatures.contains("typeWidening") &&
      snap.writerFeatures.contains("typeWidening"))
    // the recorded hop
    val tc = schemaOf(dir)("a").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc(0).getString("fromType") == "integer" &&
      tc(0).getString("toType") == "long")
    // wide rows append; the mixed table reads through the wide schema
    LakeWriter.appendDelta(Seq((4000000000L, 100L)).toDF("a", "k"), dir)
    val got = DeltaReader.read(spark, dir).select("a").as[Long].collect().toSet
    assert(got == (0L until 10L).toSet + 4000000000L)
    // time travel BELOW the widen still reads the narrow shape
    assert(DeltaReader.read(spark, dir, versionAsOf = Some(v0.version))
      .schema("a").dataType == IntegerType)
  }

  test("every lattice edge reads back: short→int, float→double, date→ntz, int→decimal, decimal growth") {
    val dir = tmp("edges")
    LakeWriter.writeDelta(spark.range(1, 4).select(
      col("id").cast("short").as("s"),
      col("id").cast("float").as("f"),
      lit(java.sql.Date.valueOf("2024-03-05")).as("d"),
      col("id").cast("int").as("i"),
      col("id").cast("decimal(5,1)").as("m")).toDF(), dir)
    LakeWriter.widenColumnType(spark, dir, "s", IntegerType)
    LakeWriter.widenColumnType(spark, dir, "f", DoubleType)
    LakeWriter.widenColumnType(spark, dir, "d", TimestampNTZType)
    LakeWriter.widenColumnType(spark, dir, "i", DecimalType(12, 1))
    LakeWriter.widenColumnType(spark, dir, "m", DecimalType(9, 3))
    val r = DeltaReader.read(spark, dir).orderBy("s")
      .selectExpr("s", "f", "cast(d as string) d", "cast(i as string) i",
        "cast(m as string) m")
      .as[(Int, Double, String, String, String)].collect().toSeq
    assert(r == Seq(
      (1, 1.0, "2024-03-05 00:00:00", "1.0", "1.000"),
      (2, 2.0, "2024-03-05 00:00:00", "2.0", "2.000"),
      (3, 3.0, "2024-03-05 00:00:00", "3.0", "3.000")), r.toString)
    // chained hops accumulate
    LakeWriter.widenColumnType(spark, dir, "s", LongType)
    val tc = schemaOf(dir)("s").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.map(m => (m.getString("fromType"), m.getString("toType"))).toSeq ==
      Seq(("short", "integer"), ("integer", "long")))
    // predicate pushdown over mixed-width files still answers right
    assert(DeltaReader.readWhere(spark, dir, "s = 2").count() == 1)
  }

  test("catalog SQL: ALTER TABLE ... ALTER COLUMN ... TYPE BIGINT routes and mutations survive") {
    val root = spark.conf.getOption("spark.sql.catalog.graft.root").getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft_widen_cat_")
        .toAbsolutePath.toString
      spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", d)
      d
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.wd")
    spark.sql("CREATE TABLE graft.wd.t (a INT, k BIGINT)")
    spark.sql("INSERT INTO graft.wd.t VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft.wd.t ALTER COLUMN a TYPE BIGINT")
    assert(spark.table("graft.wd.t").schema("a").dataType == LongType)
    spark.sql("INSERT INTO graft.wd.t VALUES (4000000000, 30)")
    // copy-on-write mutation on the widened (v7 feature) table
    spark.sql("DELETE FROM graft.wd.t WHERE k = 10")
    assert(spark.sql("SELECT sum(a) FROM graft.wd.t").as[Long].head() == 4000000002L)
    val dir = s"$root/wd/t"
    assert(DeltaReader.snapshot(spark, dir, None).writerFeatures.contains("typeWidening"))
  }

  test("refusals: narrowing, cross-family, partition and identity columns, lossy decimal") {
    val dir = tmp("refuse")
    LakeWriter.writeDelta(Seq((1L, "x", "p1", BigDecimal("1.25"))).toDF("l", "s", "p", "m")
      .select(col("l"), col("s"), col("p"), col("m").cast("decimal(10,2)").as("m")), dir,
      partitionBy = Seq("p"))
    def refuse(c: String, to: DataType, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        LakeWriter.widenColumnType(spark, dir, c, to)
      }
      assert(e.getMessage.contains(frag), s"$c → $to: ${e.getMessage}")
    }
    refuse("l", IntegerType, "not a widening")
    refuse("s", LongType, "not a widening")
    refuse("p", LongType, "partition column")
    refuse("m", DecimalType(10, 1), "not a widening") // scale shrink drops digits
    refuse("m", DecimalType(12, 5), "not a widening") // integral digits shrink
    LakeWriter.widenColumnType(spark, dir, "m", DecimalType(11, 3)) // lossless: ok
    assert(DeltaReader.read(spark, dir).selectExpr("cast(m as string)")
      .as[String].head() == "1.250")
    val e = intercept[IllegalArgumentException] {
      LakeWriter.widenColumnType(spark, dir, "nope", LongType)
    }
    assert(e.getMessage.contains("not in"), e.getMessage)
  }

  test("NESTED widening: s.n INT -> BIGINT, old narrow files up-cast, history records the hop") {
    val s0 = spark
    import s0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_widen_nested_").toFile.getPath
    LakeWriter.writeDelta(spark.range(0, 3).selectExpr(
      "id", "named_struct('n', CAST(id AS INT), 'tag', concat('t', id)) AS s")
      .coalesce(1), dir)
    LakeWriter.widenColumnType(spark, dir, "s.n", org.apache.spark.sql.types.LongType)
    val snap = DeltaReader.snapshot(spark, dir, None)
    val sT = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sT("n").dataType == org.apache.spark.sql.types.LongType)
    assert(sT("n").metadata.contains("delta.typeChanges"))
    // the OLD narrow file up-casts through the declared schema
    val got = DeltaReader.read(spark, dir).selectExpr("id", "s.n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), got.toString)
    // appends in the WIDE shape land beside the narrow files
    LakeWriter.appendDelta(spark.range(10, 11).selectExpr(
      "id", "named_struct('n', id * 100, 'tag', concat('t', id)) AS s")
      .coalesce(1), dir)
    assert(DeltaReader.read(spark, dir).selectExpr("s.n").where("id = 10")
      .collect().head.getLong(0) == 1000L)
    // SQL spelling for a nested leaf
    val dir2 = java.nio.file.Files.createTempDirectory("graft_widen_nested2_").toFile.getPath
    LakeWriter.writeDelta(spark.range(0, 2).selectExpr(
      "id", "named_struct('n', CAST(id AS INT)) AS s").coalesce(1), dir2)
    spark.sql(s"ALTER TABLE graft_delta.`$dir2` ALTER COLUMN s.n TYPE BIGINT")
    assert(DeltaReader.read(spark, dir2).schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(DeltaReader.read(spark, dir2).selectExpr("sum(s.n)").collect()
      .head.getLong(0) == 1L)
  }
}
