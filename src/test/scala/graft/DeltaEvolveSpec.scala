package graft

import graft.sources.{DeltaReader, LakeWriter}

/** Schema-evolution appends (`LakeWriter.appendDeltaEvolve`): new
  * columns append nullable, holes null-fill, historic versions keep
  * their historic schema, and the refusal surface stays loud.
  */
class DeltaEvolveSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  test("a new column evolves the schema; old rows read null; time travel keeps the old shape") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir) // v0
    LakeWriter.appendDeltaEvolve(
      Seq((2L, "c", 10L), (3L, "d", 20L)).toDF("id", "v", "extra").coalesce(1), dir)  // v1

    val latest = DeltaReader.read(spark, dir)
    assert(latest.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(latest.select("id", "v", "extra").as[(Long, String, Option[Long])]
      .collect().toSet == Set((0L, "a", None), (1L, "b", None),
        (2L, "c", Some(10L)), (3L, "d", Some(20L))))
    // historic read replays the historic schemaString
    val v0 = DeltaReader.read(spark, dir, Some(0L))
    assert(v0.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(v0.as[(Long, String)].collect().toSet == Set((0L, "a"), (1L, "b")))
    // checkpoint + replay keeps the merged schema
    LakeWriter.checkpointDelta(spark, dir, 1L)
    assert(DeltaReader.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "v", "extra"))
  }

  test("holes null-fill when nullable; strict appendDelta then needs the full arity") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_hole_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)       // v0
    LakeWriter.appendDeltaEvolve(Seq(Tuple1(1L)).toDF("id").coalesce(1), dir)    // v1: v null-fills
    assert(DeltaReader.read(spark, dir).select("id", "v")
      .as[(Long, Option[String])].collect().toSet ==
      Set((0L, Some("a")), (1L, None)))
    // the schema did NOT change (no new columns): still (id, v)
    assert(DeltaReader.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "v"))
    // strict append still enforces exact arity on the merged schema
    val e = intercept[IllegalArgumentException] {
      LakeWriter.appendDelta(Seq(Tuple1(9L)).toDF("id").coalesce(1), dir)
    }
    assert(e.getMessage.contains("columns"), e.getMessage)
  }

  test("evolution refuses type changes, non-nullable holes, and missing partition columns") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_ref_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)
    val e1 = intercept[IllegalArgumentException] {
      LakeWriter.appendDeltaEvolve(Seq(("x", "b")).toDF("id", "v").coalesce(1), dir)
    }
    assert(e1.getMessage.contains("type mismatch"), e1.getMessage)

    // non-nullable hole: build a table whose schemaString declares v
    // non-nullable, then evolve-append without v
    val dir2 = tmp("graft_evo_nn_")
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType,
        nullable = false)))
    val log2 = new java.io.File(dir2, "_delta_log"); log2.mkdirs()
    java.nio.file.Files.write(new java.io.File(log2, "0" * 20 + ".json").toPath,
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        s"""{"metaData":{"id":"e","format":{"provider":"parquet","options":{}},"schemaString":${
          om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}""")
        .getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.appendDeltaEvolve(Seq(Tuple1(1L)).toDF("id").coalesce(1), dir2)
    }
    assert(e2.getMessage.contains("non-nullable"), e2.getMessage)

    // partition column missing from the appended data
    val dir3 = tmp("graft_evo_part_")
    LakeWriter.writeDelta(Seq((0L, "a", "x")).toDF("id", "v", "p"), dir3,
      partitionBy = Seq("p"))
    val e3 = intercept[IllegalArgumentException] {
      LakeWriter.appendDeltaEvolve(Seq((1L, "b")).toDF("id", "v").coalesce(1), dir3)
    }
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
  }

  test("evolution on a partitioned table keeps partitioning; successive evolutions stack") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_stack_")
    LakeWriter.writeDelta(Seq((0L, "a", "x")).toDF("id", "v", "p"), dir,
      partitionBy = Seq("p"))                                                  // v0
    LakeWriter.appendDeltaEvolve(
      Seq((1L, "b", "y", 1.5)).toDF("id", "v", "p", "w").coalesce(1), dir)     // v1: +w
    LakeWriter.appendDeltaEvolve(
      Seq((2L, "c", "x", 2.5, true)).toDF("id", "v", "p", "w", "f").coalesce(1), dir) // v2: +f
    val df = DeltaReader.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "p", "w", "f"))
    assert(df.select("id", "v", "p", "w", "f")
      .as[(Long, String, String, Option[Double], Option[Boolean])].collect().toSet ==
      Set((0L, "a", "x", None, None), (1L, "b", "y", Some(1.5), None),
        (2L, "c", "x", Some(2.5), Some(true))))
    // partition pruning still rides the log's partitionValues
    assert(DeltaReader.readPartition(spark, dir, Map("p" -> "x"))
      .select("id").as[Long].collect().toSet == Set(0L, 2L))
  }

  test("evolution on a COLUMN-MAPPED table assigns physical names and stays readable") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_cm_")
    LakeWriter.writeDeltaMapped(Seq((0L, "a")).toDF("id", "v"), dir)
    LakeWriter.appendDeltaEvolve(
      Seq((1L, "b", 1.5)).toDF("id", "v", "score").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    val f = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("score")
    assert(f.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    // the staged parquet carries PHYSICAL names — the logical read maps back
    val got = DeltaReader.read(spark, dir)
    assert(got.columns.toSeq == Seq("id", "v", "score"))
    import org.apache.spark.sql.functions.col
    assert(got.where(col("score") === 1.5).count() == 1)
    assert(got.where(col("score").isNull).count() == 1) // v0's file null-fills
    // schema-stable CM appends still work on the evolved table
    LakeWriter.appendDelta(
      Seq((2L, "c", java.lang.Double.valueOf(2.5))).toDF("id", "v", "score")
        .coalesce(1), dir)
    assert(DeltaReader.read(spark, dir).count() == 3)
  }

  test("NESTED evolution: new struct fields append inside; old rows null-fill; holes align") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_nested_")
    LakeWriter.writeDelta(spark.range(0, 2).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s").coalesce(1), dir)
    // batch carries s with an EXTRA nested field 'score' (and the rest)
    LakeWriter.appendDeltaEvolve(spark.range(10, 12).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id), 'score', CAST(id * 1.5 AS DOUBLE)) AS s")
      .coalesce(1), dir)
    val got = DeltaReader.read(spark, dir)
    val sType = got.schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(sType.fieldNames.toSeq == Seq("x", "tag", "score"))
    val rows = got.selectExpr("id", "s.x", "s.tag", "s.score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(rows == Set(
      (0L, 0L, "t0", None), (1L, 2L, "t1", None),
      (10L, 20L, "t10", Some(15.0)), (11L, 22L, "t11", Some(16.5))), rows.toString)
    // a later batch in the PRE-evolution shape null-fills the nested hole
    LakeWriter.appendDeltaEvolve(spark.range(20, 21).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s").coalesce(1), dir)
    val hole = DeltaReader.read(spark, dir).selectExpr("s.x", "s.score")
      .where("id = 20").collect().head
    assert(hole.getLong(0) == 40L && hole.isNullAt(1))
    // time travel below the evolution keeps the two-field struct
    assert(DeltaReader.read(spark, dir, Some(0L)).schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("x", "tag"))
    // a nested TYPE change still refuses
    val e = intercept[IllegalArgumentException] {
      LakeWriter.appendDeltaEvolve(spark.range(30, 31).selectExpr(
        "id", "named_struct('x', CAST(id AS STRING), 'tag', concat('t', id)) AS s")
        .coalesce(1), dir)
    }
    assert(e.getMessage.contains("type mismatch"), e.getMessage)
  }

  test("NESTED evolution on a COLUMN-MAPPED table assigns per-level physical names + ids") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_evo_nested_cm_")
    LakeWriter.writeDeltaMapped(spark.range(0, 2).selectExpr(
      "id", "named_struct('x', id * 2) AS s").coalesce(1), dir)
    val max0 = DeltaReader.snapshot(spark, dir, None)
      .configuration("delta.columnMapping.maxColumnId").toLong
    LakeWriter.appendDeltaEvolve(spark.range(10, 12).selectExpr(
      "id", "named_struct('x', id * 2, 'extra', concat('e', id)) AS s").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong == max0 + 1)
    val sF = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("s")
    val extraF = sF.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("extra")
    assert(extraF.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    assert(extraF.metadata.getLong("delta.columnMapping.id") == max0 + 1)
    // values read back; old rows null-fill the new nested leaf
    val rows = DeltaReader.read(spark, dir).selectExpr("id", "s.x", "s.extra").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(rows == Set((0L, 0L, None), (1L, 2L, None),
      (10L, 20L, Some("e10")), (11L, 22L, Some("e11"))), rows.toString)
    // the staged file keys the new leaf by its PHYSICAL name — find
    // the evolution add BY that key (part-file names are uuids; any
    // order-based pick is nondeterministic)
    val phys = extraF.metadata.getString("delta.columnMapping.physicalName")
    val add = snap.active.find(_.stats.exists(_.contains(phys)))
      .getOrElse(fail(s"no add carries stats keyed by $phys: " +
        snap.active.flatMap(_.stats).mkString(" | ")))
    // pruning on the evolved nested leaf works through the remap: the
    // EVOLUTION add (whose stats carry the new physical key) prunes
    // away; the pre-evolution file has no key for the leaf and
    // may-matches — the sound answer
    val kept = graft.sources.DeltaStats.prune(spark, snap.active, "s.extra = 'zzz'", snap)
      .map(_.path).toSet
    assert(!kept.contains(add.path), kept.toString)
    assert(graft.sources.DeltaStats.prune(spark, snap.active, "s.extra = 'e11'", snap)
      .map(_.path).contains(add.path))
  }

  test("evolution on a foreign PER-LEVEL nested table stages physical struct leaves (no null-fill)") {
    import org.apache.spark.sql.types._
    // a foreign name-mode table whose files AND schema carry physical
    // names at EVERY level: c_id, p_s { p_x, p_tag } — the shape where
    // a top-level-only rename would corrupt (nested leaves staged
    // under logical names read back as nulls)
    val dir = java.nio.file.Files.createTempDirectory("graft_evo_nest_").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val stage = new java.io.File(dir, "_stage_seed")
    spark.range(0, 10).selectExpr(
      "id AS c_id", "named_struct('p_x', id * 2, 'p_tag', concat('t', id)) AS p_s")
      .coalesce(1).write.parquet(stage.getPath)
    val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(pf.toPath, new java.io.File(dir, "n-seed.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    def fld(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "c_id", 1),
      fld("s", StructType(Seq(
        fld("x", LongType, "p_x", 3), fld("tag", StringType, "p_tag", 4))), "p_s", 2)))
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"evn","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"4"}}}""",
      """{"add":{"path":"n-seed.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    ).mkString("\n").getBytes("UTF-8"))

    // EVOLUTION append with a new column: the grew path must stage the
    // nested leaves under their PER-LEVEL physical names
    LakeWriter.appendDeltaEvolve(spark.range(900, 902).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s",
      "id + 1 AS extra").coalesce(1), dir.getPath)
    // new rows read their struct values back (NOT null-fill) and the
    // new column carries data; old rows null-fill only `extra`
    val got = DeltaReader.read(spark, dir.getPath)
      .selectExpr("id", "s.x", "s.tag", "extra").where("id = 901").collect()
    assert(got.length == 1 && got(0).getLong(1) == 1802L &&
      got(0).getString(2) == "t901" && got(0).getLong(3) == 902L, got.mkString(","))
    val old = DeltaReader.read(spark, dir.getPath)
      .selectExpr("id", "s.x", "extra").where("id = 3").collect()
    assert(old.length == 1 && old(0).getLong(1) == 6L && old(0).isNullAt(2))
    // on disk: the staged file's struct leaves carry physical names
    val snap = DeltaReader.snapshot(spark, dir.getPath, None)
    val add = snap.active.find(_.path != "n-seed.parquet").get
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dir.getPath, add.path),
        spark.sessionState.newHadoopConf()))
    val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
    val grp = msg.getType(msg.getFieldIndex("p_s")).asGroupType()
    import scala.jdk.CollectionConverters._
    assert(grp.getFields.asScala.map(_.getName).toSet == Set("p_x", "p_tag"),
      msg.toString)
    // and its stats key the dotted PHYSICAL path, so nested pruning
    // works (the stats-less seed add may-matches by design; the new
    // add's envelope is what prunes)
    val mv = om.readTree(add.stats.get).get("minValues")
    assert(mv.get("p_s").has("p_x"), mv.toString)
    assert(graft.sources.DeltaStats.prune(spark, snap.active, "s.x >= 1800", snap)
      .map(_.path).contains(add.path))
    assert(!graft.sources.DeltaStats.prune(spark, snap.active, "s.x > 100000", snap)
      .map(_.path).contains(add.path))
  }
}
