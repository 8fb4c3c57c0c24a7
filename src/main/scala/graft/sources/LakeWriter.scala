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
