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
}
