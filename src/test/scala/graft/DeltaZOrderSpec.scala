package graft

import graft.sources.{DeltaReader, LakeWriter}

/** Z-order compaction for Delta tables: rows preserved exactly, layout
  * clustered on the Morton curve, dataChange=false semantics (CDF and
  * streaming skip it), DV debt folded away.
  */
class DeltaZOrderSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  test("z-order rewrite preserves rows, bounds file count, and clusters both columns") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_zo_")
    // 4 appends of scattered (x, y) points = 4 unclustered files
    val pts = for { i <- 0L until 400L } yield (i, (i * 37) % 400, (i * 91) % 400)
    pts.grouped(100).foreach { g =>
      if (!DeltaReader.isDeltaTable(dir))
        LakeWriter.writeDelta(g.toDF("id", "x", "y").coalesce(1), dir)
      else LakeWriter.appendDelta(g.toDF("id", "x", "y").coalesce(1), dir)
    }
    val before = DeltaReader.snapshot(spark, dir, None)
    assert(before.active.size == 4)

    LakeWriter.compactDeltaZOrder(spark, dir, "x", "y", filesPerPartition = 4)
    val after = DeltaReader.snapshot(spark, dir, None)
    assert(after.version == before.version + 1)
    assert(after.active.size <= 4)
    // rows exactly preserved
    assert(DeltaReader.read(spark, dir).as[(Long, Long, Long)].collect().toSet ==
      pts.toSet)
    // clustering: each new file's x-range and y-range must both be a
    // strict subset of the full domain (the scattered input files each
    // spanned ~the whole domain on both axes)
    val spans = after.active.map { a =>
      val f = s.read.parquet(new java.io.File(dir, a.path).getPath)
      val r = f.agg(org.apache.spark.sql.functions.min("x"),
        org.apache.spark.sql.functions.max("x"),
        org.apache.spark.sql.functions.min("y"),
        org.apache.spark.sql.functions.max("y")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // average span per axis well under the 0..399 domain
    val (sx, sy) = (spans.map(_._1).sum / spans.size, spans.map(_._2).sum / spans.size)
    assert(sx < 300 && sy < 300, s"files not clustered: avg x-span $sx, y-span $sy")
    // time travel below the rewrite still sees the old layout's data
    assert(DeltaReader.read(spark, dir, Some(before.version))
      .as[(Long, Long, Long)].collect().toSet == pts.toSet)
  }

  test("z-order is dataChange=false: CDF readChanges skips its commit") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_zo_cdf_")
    LakeWriter.writeDelta((0L until 100L).map(i => (i, i % 10, i / 10))
      .toDF("id", "x", "y").repartition(3), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    LakeWriter.compactDeltaZOrder(spark, dir, "x", "y", filesPerPartition = 2)
    assert(DeltaReader.readChanges(spark, dir, 1L, 1L).count() == 0L)
  }

  test("partitioned table: z-order rewrites within partitions, pruning intact") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_zo_part_")
    val rows = for { p <- Seq("a", "b"); i <- 0L until 50L }
      yield (i, (i * 7) % 50, (i * 13) % 50, p)
    LakeWriter.writeDelta(rows.toDF("id", "x", "y", "p").repartition(4), dir,
      partitionBy = Seq("p"))
    LakeWriter.compactDeltaZOrder(spark, dir, "x", "y", filesPerPartition = 2)
    val after = DeltaReader.snapshot(spark, dir, None)
    // per-partition file bound
    after.active.groupBy(_.partitionValues).foreach { case (pv, files) =>
      assert(files.size <= 2, s"partition $pv has ${files.size} files")
    }
    assert(DeltaReader.readPartition(spark, dir, Map("p" -> "a"))
      .count() == 50L)
    assert(DeltaReader.read(spark, dir).as[(Long, Long, Long, String)]
      .collect().toSet == rows.toSet)
  }

  test("DV debt folds away through the z-order rewrite") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_zo_dv_")
    LakeWriter.writeDelta((0L until 100L).map(i => (i, i % 10, i / 10))
      .toDF("id", "x", "y").coalesce(1), dir)
    assert(LakeWriter.deleteWhereDv(spark, dir, "id < 20").size == 1)
    LakeWriter.compactDeltaZOrder(spark, dir, "x", "y", filesPerPartition = 2)
    val after = DeltaReader.snapshot(spark, dir, None)
    assert(after.active.forall(_.dv.isEmpty), "z-order must drop DV descriptors")
    assert(DeltaReader.read(spark, dir).select("id").as[Long].collect().toSet ==
      (20L until 100L).toSet)
  }

  test("z-order and clustered OPTIMIZE on COLUMN-MAPPED tables keep physical footers and pruning") {
    val s0 = spark
    import s0.implicits._
    import org.apache.spark.sql.types._
    def footerCheck(dir: String, paths: Seq[String], wantIds: Boolean): Unit = {
      val hconf = spark.sessionState.newHadoopConf()
      paths.foreach { p =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(dir, p), hconf))
        val msg = try rdr.getFooter.getFileMetaData.getSchema finally rdr.close()
        import scala.jdk.CollectionConverters._
        msg.getFields.asScala.foreach { f =>
          assert(f.getName.startsWith("col-"), s"$p: ${f.getName}")
          if (wantIds) assert(f.getId != null, s"$p: ${f.getName} has no field id")
        }
      }
    }
    // NAME mode: graft-mapped table, 2-column z-order
    val dirN = tmp("graft_zo_cmn_")
    val pts = for { i <- 0L until 400L } yield (i, (i * 37) % 400, (i * 91) % 400)
    LakeWriter.writeDeltaMapped(pts.take(200).toDF("id", "x", "y").repartition(2), dirN)
    LakeWriter.appendDelta(pts.drop(200).toDF("id", "x", "y").repartition(2), dirN)
    LakeWriter.compactDeltaZOrder(spark, dirN, "x", "y", filesPerPartition = 4)
    val snapN = DeltaReader.snapshot(spark, dirN, None)
    assert(DeltaReader.read(spark, dirN).as[(Long, Long, Long)].collect().toSet ==
      pts.toSet)
    footerCheck(dirN, snapN.active.map(_.path), wantIds = true)
    // the rewritten files carry physically-keyed stats that prune
    assert(graft.sources.DeltaStats.prune(spark, snapN.active, "id > 100000", snapN)
      .isEmpty)

    // ID mode: foreign fixture, clusterBy declaration + clustered OPTIMIZE
    val dirF = java.nio.file.Files.createTempDirectory("graft_zo_cmi_").toFile
    val log = new java.io.File(dirF, "_delta_log"); log.mkdirs()
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    def fld(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "col-z1", 1), fld("v", StringType, "col-z2", 2)))
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"zoid","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"}}}"""
    ).mkString("\n").getBytes("UTF-8"))
    val dirI = dirF.getPath
    (0 until 3).foreach { b =>
      LakeWriter.appendDelta((0 until 50).map(i =>
        ((b * 50 + i).toLong, s"v${b * 50 + i}")).toDF("id", "v").coalesce(1), dirI)
    }
    LakeWriter.clusterBy(spark, dirI, Seq("id"))
    LakeWriter.compactDeltaCluster(spark, dirI, Seq("id"), filesPerPartition = 2)
    val snapI = DeltaReader.snapshot(spark, dirI, None)
    assert(DeltaReader.read(spark, dirI).as[(Long, String)].collect().toSet ==
      (0 until 150).map(i => (i.toLong, s"v$i")).toSet)
    // clustered adds carry the liquid tag and physical/field-id footers
    val clustered = snapI.active.filter(_.clusteringProvider.contains("liquid"))
    assert(clustered.nonEmpty, "clustered OPTIMIZE must tag its adds")
    footerCheck(dirI, clustered.map(_.path), wantIds = true)
    assert(graft.sources.DeltaStats.prune(spark, snapI.active, "id > 100000", snapI)
      .isEmpty)
  }
}
