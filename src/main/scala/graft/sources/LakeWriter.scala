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
}
