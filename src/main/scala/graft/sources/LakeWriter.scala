package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake-side sinks. The layout choices are the query accelerators:
  * directory partitioning turns equality/range predicates on the
  * partition column into file-listing pruning (no footer reads at
  * all), and in-file sorting makes parquet min/max stats selective for
  * the remaining columns — see also `LakeIndexer.writeIndex`, which
  * applies the same discipline to the cell index itself.
  */
object LakeWriter {

  /** Directory-partitioned parquet: one directory per `partitionCol`
    * value, rows sorted by `sortCols` within each file. Queries
    * filtering on the partition column scan only matching directories
    * (`PartitionFilters` in the plan, zero data files touched
    * elsewhere).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       sortCols: Seq[String] = Nil,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.repartition(df.col(partitionCol))
        .sortWithinPartitions((partitionCol +: sortCols).map(df.col): _*)
    sorted.write.mode(mode).partitionBy(partitionCol).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Z-order (Morton-curve) clustered parquet: rows are laid out along
    * an interleaved-bit curve over BOTH columns' quantile-bucket ranks,
    * so every output file covers a small rectangle of (c1, c2) space
    * and parquet min/max stats prune scans filtering on EITHER column —
    * a single-column sort only ever prunes itself. This is the layout
    * discipline behind Delta's OPTIMIZE ZORDER, exposed as a write
    * option for the plain parquet sink.
    *
    * Scale: bucket boundaries come from ONE approx_percentile aggregate
    * (255 doubles per column to the driver — corpus-size independent),
    * bucketing is a broadcast binary search per row, and the only data
    * movement is the range exchange on the z-value.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    numFiles: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    val qs = (1 until 256).map(_ / 256.0)
    val bounds = df.select(
      percentile_approx(df.col(c1).cast("double"), lit(qs.toArray), lit(10000)),
      percentile_approx(df.col(c2).cast("double"), lit(qs.toArray), lit(10000)))
      .head()
    val b1 = bounds.getSeq[Double](0).toArray
    val b2 = bounds.getSeq[Double](1).toArray
    def bucket(bs: Array[Double], v: Double): Int = {
      val i = java.util.Arrays.binarySearch(bs, v)
      if (i >= 0) i + 1 else -(i + 1)
    }
    val zUdf = udf { (x: Double, y: Double) =>
      val a = bucket(b1, x); val b = bucket(b2, y)
      var r = 0; var i = 0
      while (i < 8) { r |= (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i)); i += 1 }
      r
    }
    df.withColumn("__z", zUdf(df.col(c1).cast("double"), df.col(c2).cast("double")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Create a Delta table at `dir` (version 0) from `df` — the write
    * side of [[DeltaReader]], emitting spec-conformant protocol /
    * metaData / add actions (PROTOCOL.md; minReaderVersion 1, no
    * column mapping). Single-writer discipline: real Delta arbitrates
    * concurrent commits through an atomic log rename, which a
    * single-pipeline sink does not need — concurrent writers to one
    * table are out of scope and would need that arbitration.
    */
  def writeDelta(df: DataFrame, dir: String): Unit =
    commitDelta(df, dir, 0L, includeMeta = true)

  /** Append `df` to an existing Delta table as its next version —
    * readers at older versions (versionAsOf) are unaffected, the new
    * snapshot sees old + new files: the same add-only incremental
    * maintenance discipline as `LakeIndexer.addTables`, but carried by
    * the table format itself.
    */
  def appendDelta(df: DataFrame, dir: String): Unit = {
    val log = new java.io.File(dir, "_delta_log")
    require(log.isDirectory, s"appendDelta: not a Delta table: $dir")
    val next = log.listFiles().toSeq
      .filter(f => f.getName.matches("\\d{20}\\.json"))
      .map(_.getName.take(20).toLong).max + 1
    commitDelta(df, dir, next, includeMeta = false)
  }

  private def commitDelta(df: DataFrame, dir: String, version: Long,
                          includeMeta: Boolean): Unit = {
    val root = new java.io.File(dir)
    val log = new java.io.File(root, "_delta_log")
    log.mkdirs()
    // stage the parquet files, then move them into the table root —
    // files only become visible through the commit that adds them
    val stage = new java.io.File(root, s"_stage_$version")
    df.write.parquet(stage.getPath)
    val moved = stage.listFiles().toSeq
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map { f =>
        val dest = new java.io.File(root, f.getName)
        java.nio.file.Files.move(f.toPath, dest.toPath)
        (f.getName, dest.length())
      }
    stage.listFiles().foreach(_.delete()); stage.delete()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val now = 0L // deterministic logs: modificationTime is informational
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    if (includeMeta) {
      actions += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      actions += s"""{"metaData":{"id":"${java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8"))}","format":{"provider":"parquet","options":{}},"schemaString":${om.writeValueAsString(df.schema.json)},"partitionColumns":[],"configuration":{}}}"""
    }
    moved.foreach { case (name, size) =>
      actions += s"""{"add":{"path":"$name","partitionValues":{},"size":$size,"modificationTime":$now,"dataChange":true}}"""
    }
    val commit = new java.io.File(log, f"$version%020d.json")
    java.nio.file.Files.write(commit.toPath, actions.mkString("\n").getBytes("UTF-8"))
  }

  /** Bucketed table layout — the CO-LOCATED JOIN mechanism: both sides
    * hash-bucketed by the join key into the same bucket count join
    * with NO exchange at all (each task reads matching bucket files
    * from both tables), where plain parquet pays two full shuffles.
    * At 100 TB this is the difference between a join that moves the
    * lake over the network and one that doesn't; the price is paid
    * once at write time. Bucketing rides the session catalog
    * (`saveAsTable` — bucket metadata lives in the metastore;
    * `spark.sql.warehouse.dir` controls the physical location).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Training-data export: a deterministic, seed-reproducible global
    * shuffle into `numShards` equal-ish shards (`shard=N` directories,
    * one file each). Order within a shard is the seeded doc-id hash —
    * so the export is bit-reproducible run-over-run for the same
    * (input, seed, numShards), and re-exporting with a new seed is a
    * fresh epoch-level reshuffle. No global sort: shard assignment and
    * in-shard order both come from the hash, so the only movement is
    * ONE hash-partitioned exchange (each row shipped once), exactly
    * what a 100-TB corpus export can afford.
    */
  def writeTrainingShards(docs: DataFrame, path: String, numShards: Int,
                          seed: Long, id: String = "doc_id",
                          mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val h = xxhash64(lit(seed), col(id))
    docs
      .withColumn("shard", pmod(h, lit(numShards)).cast("int"))
      .withColumn("__ord", h)
      .repartition(numShards, col("shard"))
      // id tie-break: equal hashes (collisions) must not make the
      // in-file order depend on arrival order
      .sortWithinPartitions(col("shard"), col("__ord"), col(id))
      .drop("__ord")
      .write.mode(mode).partitionBy("shard").parquet(path)
  }
}
