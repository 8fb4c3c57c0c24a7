package graft

import graft.sources.{DeltaReader, DeltaStats, LakeWriter}
import org.apache.spark.sql.types._

/** id-mode column-mapping WRITES (r15): every mutating path stages
  * parquet field ids through the shared stagePhysicalRows helper, so a
  * foreign id-mode table (the Iceberg-conversion shape) takes appends,
  * copy-on-write and merge-on-read mutations, merges, overwrites and a
  * CDF feed — and every staged file resolves by field id with stats
  * keyed by the dotted physical path.
  */
class DeltaIdWriteSpec extends SparkSpec {
  import spark.implicits._

  /** A hand-built FOREIGN id-mode table: one decoy-named file whose
    * parquet field ids line up with the log's columnMapping ids.
    */
  private def mkIdTable(cdf: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idw_").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val fileSchema = StructType(Seq(
      StructField("decoy_a", LongType, nullable = true, new MetadataBuilder()
        .putLong("parquet.field.id", 1L).build()),
      StructField("decoy_b", StringType, nullable = true, new MetadataBuilder()
        .putLong("parquet.field.id", 2L).build())))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val stage = new java.io.File(dir, "_stage_seed")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 8L).map(i => org.apache.spark.sql.Row(i, s"v$i")), 1), fileSchema)
      .coalesce(1).write.parquet(stage.getPath)
    val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(pf.toPath, new java.io.File(dir, "part-seed.parquet").toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(stage)
    def fld(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "col-w1", 1), fld("v", StringType, "col-w2", 2)))
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val conf = if (cdf)
      """{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2","delta.enableChangeDataFeed":"true"}"""
    else """{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"}"""
    val proto = if (cdf)
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping","changeDataFeed"]}}"""
    else """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      proto,
      s"""{"metaData":{"id":"idw","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":$conf}}""",
      """{"add":{"path":"part-seed.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    ).mkString("\n").getBytes("UTF-8"))
    dir.getPath
  }

  private def state(dir: String): Map[Long, String] =
    DeltaReader.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("id-mode mutation chain: append, CoW delete/update, merge, replaceWhere, DV delete/update — model-exact") {
    val dir = mkIdTable(cdf = false)
    var model: Map[Long, String] = (0L until 8L).map(i => i -> s"v$i").toMap
    assert(state(dir) == model)

    LakeWriter.appendDelta(
      (100L until 104L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir)
    model ++= (100L until 104L).map(i => i -> s"v$i")
    assert(state(dir) == model)

    LakeWriter.deleteWhere(spark, dir, "id % 4 = 1")
    model = model.filterNot(_._1 % 4 == 1)
    assert(state(dir) == model)

    LakeWriter.updateWhere(spark, dir, "id % 2 = 0", Map("v" -> "concat(v, 'u')"))
    model = model.map { case (k, v) => k -> (if (k % 2 == 0) v + "u" else v) }
    assert(state(dir) == model)

    LakeWriter.mergeInto(spark, dir,
      Seq((0L, "m0"), (500L, "m500")).toDF("id", "v").coalesce(1), Seq("id"))
    model ++= Seq(0L -> "m0", 500L -> "m500")
    assert(state(dir) == model)

    LakeWriter.overwriteWhere(
      Seq((500L, "r500")).toDF("id", "v").coalesce(1), dir, "id >= 500")
    model = model.filterNot(_._1 >= 500L) + (500L -> "r500")
    assert(state(dir) == model)

    LakeWriter.deleteWhereDv(spark, dir, "id = 2")
    model -= 2L
    assert(state(dir) == model)

    LakeWriter.updateWhereDv(spark, dir, "id = 6", Map("v" -> "'dv6'"))
    model += 6L -> "dv6"
    assert(state(dir) == model)

    // OPTIMIZE on the id table: the compacted files re-stage through
    // the same physical/field-id shape, rows unchanged
    LakeWriter.compactDelta(spark, dir, minFiles = 2)
    assert(state(dir) == model)

    // every rewritten file resolves BY FIELD ID with physical names
    // and carries physically-keyed stats that actually prune
    val snap = DeltaReader.snapshot(spark, dir, None)
    val hconf = spark.sessionState.newHadoopConf()
    snap.active.filterNot(_.path == "part-seed.parquet").foreach { a =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dir, a.path), hconf))
      val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
      import scala.jdk.CollectionConverters._
      val ids = msg.getFields.asScala.map(f => f.getName -> Option(f.getId).map(_.intValue))
      assert(ids.toSet == Set("col-w1" -> Some(1), "col-w2" -> Some(2)),
        s"${a.path}: $ids")
    }
    assert(DeltaStats.prune(spark, snap.active, "id > 100000", snap)
      .forall(_.path == "part-seed.parquet"))
    // overwrite: the full truncate-and-load on the id table
    LakeWriter.overwriteDelta(Seq((1L, "o1"), (2L, "o2")).toDF("id", "v").coalesce(1), dir)
    assert(state(dir) == Map(1L -> "o1", 2L -> "o2"))
    // and the whole chain time-travels + validates its checksums
    (1L to DeltaReader.snapshot(spark, dir, None).version).foreach { ver =>
      DeltaReader.read(spark, dir, Some(ver)).count()
      DeltaReader.validateChecksum(spark, dir, Some(ver))
    }
  }

  test("an id-mode write restores the user's fieldId.write setting and still stages ids") {
    val dir = mkIdTable(cdf = false)
    val key = "spark.sql.parquet.fieldId.write.enabled"
    spark.conf.set(key, "false")
    try {
      LakeWriter.appendDelta(Seq((300L, "w300")).toDF("id", "v").coalesce(1), dir)
      // the user's deliberate setting survives the write...
      assert(spark.conf.get(key) == "false")
      // ...but the staged file itself carries the ids the id contract
      // requires (the write runs on a cloned session with the flag on;
      // the user's session conf is never touched, r16)
      val snap = DeltaReader.snapshot(spark, dir, None)
      val add = snap.active.find(_.path != "part-seed.parquet").get
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dir, add.path),
          spark.sessionState.newHadoopConf()))
      val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
      import scala.jdk.CollectionConverters._
      assert(msg.getFields.asScala.forall(f => f.getId != null), msg.toString)
      assert(state(dir)(300L) == "w300")
    } finally spark.conf.unset(key)
  }

  test("id-mode schema evolution assigns a fresh field id; rename/drop are metadata-only") {
    val dir = mkIdTable(cdf = false)
    // EVOLVE: a new column appended after the table's fields gets the
    // next field id and a synthesized physical name; maxColumnId bumps
    // in the same commit
    LakeWriter.appendDeltaEvolve(
      Seq((200L, "e200", 7L)).toDF("id", "v", "w").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val wf = schema("w")
    assert(wf.metadata.getLong("delta.columnMapping.id") == 3L)
    assert(wf.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    // old rows null-fill the new column; the new row carries it
    val got = DeltaReader.read(spark, dir).selectExpr("id", "v", "w").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(200L) == (("e200", Some(7L))))
    assert(got(0L) == (("v0", None)))
    // the evolution-staged file resolves BY FIELD ID: footer carries
    // physical names with ids 1, 2, 3
    val add = snap.active.filterNot(_.path == "part-seed.parquet")
    assert(add.size == 1, add.map(_.path).mkString(","))
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dir, add.head.path),
        spark.sessionState.newHadoopConf()))
    val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
    import scala.jdk.CollectionConverters._
    val ids = msg.getFields.asScala.map(f =>
      f.getName -> Option(f.getId).map(_.intValue)).toMap
    assert(ids("col-w1").contains(1) && ids("col-w2").contains(2), ids.toString)
    val physW = wf.metadata.getString("delta.columnMapping.physicalName")
    assert(ids(physW).contains(3), ids.toString)
    // time travel below the evolution replays the two-column shape
    assert(DeltaReader.read(spark, dir, Some(0L)).schema.fieldNames.toSeq ==
      Seq("id", "v"))
    // RENAME on the id table: one metadata commit, values intact
    LakeWriter.renameColumn(spark, dir, "v", "val")
    val renamed = DeltaReader.read(spark, dir)
    assert(renamed.schema.fieldNames.toSeq == Seq("id", "val", "w"))
    assert(renamed.selectExpr("val").where("id = 200").collect()
      .head.getString(0) == "e200")
    // DROP hides the evolved column at latest; time travel keeps it
    LakeWriter.dropColumn(spark, dir, "w")
    assert(DeltaReader.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "val"))
    val latest = DeltaReader.snapshot(spark, dir, None).version
    assert(DeltaReader.read(spark, dir, Some(latest - 1))
      .schema.fieldNames.contains("w"))
    // the whole chain time-travels and validates its checksums
    (1L to latest).foreach { ver =>
      DeltaReader.read(spark, dir, Some(ver)).count()
      DeltaReader.validateChecksum(spark, dir, Some(ver))
    }
  }

  test("id-mode CDF: cdc files stage with field ids; the change feed folds to every state") {
    val dir = mkIdTable(cdf = true)
    LakeWriter.appendDelta(
      (100L until 103L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.deleteWhere(spark, dir, "id % 3 = 0")
    LakeWriter.updateWhere(spark, dir, "id = 101", Map("v" -> "'u101'"))
    val latest = DeltaReader.snapshot(spark, dir, None).version
    val changes = DeltaReader.readChanges(spark, dir, 1L, latest)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // fold inserts/deletes/updates from the seed state — must equal latest
    var folded: Map[Long, String] = (0L until 8L).map(i => i -> s"v$i").toMap
    changes.sortBy(c => (c._4, c._3 == "update_postimage")).foreach {
      case (id, v, "insert", _) => folded += id -> v
      case (id, _, "delete", _) => folded -= id
      case (id, v, "update_postimage", _) => folded += id -> v
      case _ =>
    }
    assert(folded == state(dir), s"folded=$folded state=${state(dir)}")
    // the staged cdc files themselves carry field ids (plus the
    // protocol-fixed _change_type by name)
    val cdc = DeltaReader.commitCdc(spark, dir, 2L)
    assert(cdc.nonEmpty, "delete on a CDF table must stage cdc files")
    val hconf = spark.sessionState.newHadoopConf()
    cdc.foreach { c =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          DeltaReader.resolveAddPath(new org.apache.hadoop.fs.Path(dir), c.path), hconf))
      val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
      import scala.jdk.CollectionConverters._
      val byName = msg.getFields.asScala.map(f =>
        f.getName -> Option(f.getId).map(_.intValue)).toMap
      assert(byName("col-w1").contains(1) && byName("col-w2").contains(2) &&
        byName.contains("_change_type"), byName.toString)
    }
  }
}
