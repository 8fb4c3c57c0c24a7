package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Column-mapping (name mode) WRITE interop: graft-created CM tables
  * read back through the CM read path, appends to CM tables preserve
  * the physical layout real readers resolve.
  */
class DeltaCmWriteSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows3(df: DataFrame): Set[(Long, String, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v", "src").as[(Long, String, String)].collect().toSet
  }

  test("writeDeltaMapped round-trips: logical schema out, physical names on disk") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_cmw_")
    LakeWriter.writeDeltaMapped(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val back = DeltaReader.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(back.select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the protocol is the legacy CM floor and the mode is declared
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.minReader == 2 && snap.minWriter == 5)
    assert(snap.configuration("delta.columnMapping.mode") == "name")
    // the parquet files on disk carry PHYSICAL col-<uuid> names — what
    // a real CM reader resolves; logical names exist only in metadata
    val dataFile = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val onDisk = spark.read.parquet(dataFile.getPath).schema.fieldNames
    assert(onDisk.forall(_.startsWith("col-")), onDisk.mkString(", "))
    // schemaString carries ids + physical names for every field
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    schema.fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id"), f.name)
      assert(f.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    }

    // append: new files must ALSO land with physical names
    LakeWriter.appendDelta(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(DeltaReader.read(spark, dir).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2)
    files.foreach { f =>
      val names = spark.read.parquet(f.getPath).schema.fieldNames
      assert(names.forall(_.startsWith("col-")), s"${f.getName}: ${names.mkString(", ")}")
    }
  }

  test("partitioned CM table: physical partition directories, logical reads, appends") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_cmw_part_")
    LakeWriter.writeDeltaMapped(
      Seq((1L, "a", "web"), (2L, "b", "book")).toDF("id", "v", "src"),
      dir, partitionBy = Seq("src"))
    // partition directories use the PHYSICAL name of src
    val partDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_"))
    assert(partDirs.nonEmpty && partDirs.forall(_.startsWith("col-")),
      partDirs.mkString(", "))
    val back = DeltaReader.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "src"))
    assert(rows3(back) == Set((1L, "a", "web"), (2L, "b", "book")))
    LakeWriter.appendDelta(Seq((3L, "c", "web")).toDF("id", "v", "src"), dir)
    assert(rows3(DeltaReader.read(spark, dir)) ==
      Set((1L, "a", "web"), (2L, "b", "book"), (3L, "c", "web")))
    // time travel still works across the CM append
    assert(rows3(DeltaReader.read(spark, dir, Some(0L))) ==
      Set((1L, "a", "web"), (2L, "b", "book")))
  }

  test("append to a foreign-named CM fixture preserves ITS physical layout") {
    val s = spark
    import s.implicits._
    // a CM table as delta-spark would leave it: physical names that are
    // NOT graft's deterministic ones
    val dir = java.nio.file.Files.createTempDirectory("graft_cmw_fix_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    val stage = new java.io.File(dir, "_stage_fix")
    Seq((1L, "a")).toDF("xA", "xB").coalesce(1).write.parquet(stage.getPath)
    val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(pf.toPath, new java.io.File(dir, "part-fix.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    def fld(name: String, tpe: org.apache.spark.sql.types.DataType, phys: String, id: Int) =
      StructField(name, tpe, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.columnMapping.physicalName", phys)
          .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "xA", 1), fld("v", StringType, "xB", 2)))
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    java.nio.file.Files.write(new java.io.File(log, f"${0L}%020d.json").toPath,
      Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cm-fix","format":{"provider":"parquet","options":{}},"schemaString":${
          om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""",
        """{"add":{"path":"part-fix.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
      ).mkString("\n").getBytes("UTF-8"))
    LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "v"), dir.getPath)
    assert(DeltaReader.read(spark, dir.getPath).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // the appended file resolves under the FIXTURE's physical names
    val appended = new java.io.File(dir.getPath).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "part-fix.parquet")
    assert(appended.length == 1)
    assert(spark.read.parquet(appended.head.getPath).schema.fieldNames.toSeq ==
      Seq("xA", "xB"))
  }

  test("CM table survives checkpoint + retention through its own written checkpoint") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_cmw_cp_")
    LakeWriter.writeDeltaMapped(Seq((1L, "a")).toDF("id", "v"), dir)
    LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "v"), dir)
    LakeWriter.checkpointDelta(spark, dir, 1L)
    val log = new java.io.File(dir, "_delta_log")
    (0 to 1).foreach(i => new java.io.File(log, f"$i%020d.json").delete())
    val back = DeltaReader.read(spark, dir)
    assert(back.select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // and the table still accepts appends from the checkpoint base
    LakeWriter.appendDelta(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(DeltaReader.read(spark, dir).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("OPTIMIZE on a name-mode table: compacted files keep physical names, rows and pruning intact") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_cmw_opt_")
    LakeWriter.writeDeltaMapped(
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4), dir)
    LakeWriter.appendDelta((40L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(2), dir)
    val before = DeltaReader.read(spark, dir)
      .select("id", "v").as[(Long, String)].collect().toSet
    LakeWriter.compactDelta(spark, dir, minFiles = 2)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.size < 6, s"compaction must fold: ${snap.active.size}")
    assert(DeltaReader.read(spark, dir)
      .select("id", "v").as[(Long, String)].collect().toSet == before)
    // compacted footers carry PHYSICAL column names (the read contract)
    val hconf = spark.sessionState.newHadoopConf()
    snap.active.filter(_.path.contains("part-compact")).foreach { a =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dir, a.path), hconf))
      val names = try {
        import scala.jdk.CollectionConverters._
        rdr.getFooter.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSeq
      } finally rdr.close()
      assert(names.forall(_.startsWith("col-")), s"${a.path}: $names")
      // and they carry stats that prune
      assert(a.stats.isDefined, a.path)
    }
    assert(graft.sources.DeltaStats.prune(spark, snap.active, "id > 10000", snap).isEmpty)
  }

  test("autoCompact folds small-file debt on an id-mode table; folded files keep ids") {
    import org.apache.spark.sql.types._
    val s0 = spark
    import s0.implicits._
    // a foreign id-mode table DECLARING autoCompact — before r16 the
    // maintenance silently skipped ALL column-mapped tables
    val dirF = java.nio.file.Files.createTempDirectory("graft_cmw_ac_").toFile
    val log = new java.io.File(dirF, "_delta_log"); log.mkdirs()
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    def fld(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "col-a1", 1), fld("v", StringType, "col-a2", 2)))
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"acid","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2","delta.autoOptimize.autoCompact":"true"}}}"""
    ).mkString("\n").getBytes("UTF-8"))
    val dir = dirF.getPath
    spark.conf.set("spark.graft.delta.autoCompact.minNumFiles", "4")
    try {
      (0 until 6).foreach { i =>
        LakeWriter.appendDelta(
          Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1), dir)
      }
      val snap = graft.sources.DeltaReader.snapshot(spark, dir, None)
      // debt folded: well under the 6 per-batch files
      assert(snap.active.size < 4, s"autoCompact must fold: ${snap.active.size}")
      assert(graft.sources.DeltaReader.read(spark, dir).select("id", "v")
        .as[(Long, String)].collect().toSet ==
        (0 until 6).map(i => (i.toLong, s"v$i")).toSet)
      // every live file resolves by field id under physical names
      val hconf = spark.sessionState.newHadoopConf()
      snap.active.foreach { a =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(dir, a.path), hconf))
        val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
        import scala.jdk.CollectionConverters._
        val ids = msg.getFields.asScala.map(f =>
          f.getName -> Option(f.getId).map(_.intValue)).toMap
        assert(ids == Map("col-a1" -> Some(1), "col-a2" -> Some(2)),
          s"${a.path}: $ids")
      }
    } finally spark.conf.unset("spark.graft.delta.autoCompact.minNumFiles")
  }

  test("optimizeWrite folds a many-task batch on a MAPPED table, field ids intact") {
    val s0 = spark
    import s0.implicits._
    val dir = tmp("graft_cmw_ow_")
    LakeWriter.writeDeltaMapped(Seq((0L, "seed")).toDF("id", "v"), dir)
    LakeWriter.alterProperties(spark, dir,
      Map("delta.autoOptimize.optimizeWrite" -> "true"), Nil)
    // an 8-task tiny batch folds to ONE staged file (r16: previously
    // the fold silently skipped any field-id-carrying staged set, so
    // optimizeWrite was quietly ignored on mapped tables)
    LakeWriter.appendDelta(
      (1L until 9L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8), dir)
    val snap = graft.sources.DeltaReader.snapshot(spark, dir, None)
    val newAdds = snap.active.filter(_.path.startsWith("part-")).filterNot(a =>
      graft.sources.DeltaReader.snapshot(spark, dir, Some(0L)).active
        .exists(_.path == a.path))
    assert(newAdds.size == 1, s"fold must leave one add: ${newAdds.map(_.path)}")
    // the folded file keeps physical names AND parquet field ids
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dir, newAdds.head.path),
        spark.sessionState.newHadoopConf()))
    val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
    import scala.jdk.CollectionConverters._
    assert(msg.getFields.asScala.forall(f =>
      f.getName.startsWith("col-") && f.getId != null), msg.toString)
    assert(graft.sources.DeltaReader.read(spark, dir).count() == 9L)
  }

  test("legacy writer obligations: constraints and generated columns ENFORCE on append") {
    val s = spark
    import s.implicits._
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val plain = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    def mk(metaExtra: String, schema: StructType): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_cmw_gate_").toFile
      val log = new java.io.File(dir, "_delta_log")
      log.mkdirs()
      java.nio.file.Files.write(new java.io.File(log, f"${0L}%020d.json").toPath,
        Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
          s"""{"metaData":{"id":"g1","format":{"provider":"parquet","options":{}},"schemaString":${
            om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{$metaExtra}}}"""
        ).mkString("\n").getBytes("UTF-8"))
      dir.getPath
    }
    // a CHECK constraint in configuration ENFORCES: passing rows write,
    // a violating batch refuses wholesale with the named check
    val d1 = mk(""""delta.constraints.positive":"id > 0"""", plain)
    LakeWriter.appendDelta(Seq((1L, "a")).toDF("id", "v"), d1)
    assert(DeltaReader.read(spark, d1).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    val e1 = intercept[IllegalArgumentException] {
      LakeWriter.appendDelta(Seq((0L, "z"), (2L, "b")).toDF("id", "v"), d1)
    }
    assert(e1.getMessage.contains("violate") &&
      e1.getMessage.contains("positive"), e1.getMessage)
    // the violating batch wrote NOTHING
    assert(DeltaReader.read(spark, d1).count() == 1L)
    // a generated column VERIFIES provided values...
    val gen = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "CAST(id AS STRING)").build())))
    val d2 = mk("", gen)
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.appendDelta(Seq((1L, "a")).toDF("id", "v"), d2)
    }
    assert(e2.getMessage.contains("generated column 'v'"), e2.getMessage)
    LakeWriter.appendDelta(Seq((1L, "1")).toDF("id", "v"), d2)
    // ...and COMPUTES omitted ones
    LakeWriter.appendDelta(Seq(Tuple1(7L)).toDF("id"), d2)
    assert(DeltaReader.read(spark, d2).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "1"), (7L, "7")))
    // ...but a bare version-4 table with neither declared appends fine
    val d3 = mk("", plain)
    LakeWriter.appendDelta(Seq((1L, "a")).toDF("id", "v"), d3)
    assert(DeltaReader.read(spark, d3).select("id", "v")
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    // UPDATE and MERGE verify the same obligations on their rewrites:
    // an update that would break the CHECK constraint refuses atomically
    val e3 = intercept[Exception] {
      LakeWriter.updateWhere(spark, d1, "id = 1", Map("id" -> "-id"))
    }
    assert(e3.getMessage.contains("violate") || Option(e3.getCause).exists(
      _.getMessage.contains("violate")), e3.getMessage)
    assert(DeltaReader.read(spark, d1).select("id").as[Long].collect().toSet == Set(1L))
    // a constraint-respecting update lands
    assert(LakeWriter.updateWhere(spark, d1, "id = 1", Map("id" -> "id + 10")).nonEmpty)
    assert(DeltaReader.read(spark, d1).select("id").as[Long].collect().toSet == Set(11L))
    // merge: a violating source row refuses the whole merge
    val e4 = intercept[Exception] {
      LakeWriter.mergeInto(spark, d1, Seq((-5L, "x")).toDF("id", "v"), Seq("id"))
    }
    assert(e4.getMessage.contains("violate") || Option(e4.getCause).exists(
      _.getMessage.contains("violate")), e4.getMessage)
    assert(LakeWriter.mergeInto(spark, d1, Seq((5L, "x")).toDF("id", "v"), Seq("id")).isEmpty)
    assert(DeltaReader.read(spark, d1).select("id").as[Long].collect().toSet ==
      Set(5L, 11L))
  }
}
