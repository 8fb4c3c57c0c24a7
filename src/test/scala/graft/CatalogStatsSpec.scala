package graft

import graft.sources.LakeWriter
import org.apache.spark.sql.functions._

/** Join planning over catalog-named graft tables: the analyzer
  * substitution (GraftCatalogScanRule) splices the production reader
  * plan in place of the DSv2 relation, so the optimizer sees the
  * parquet relation's REAL byte sizes — a small dimension table under
  * `spark.sql.autoBroadcastJoinThreshold` must plan a broadcast hash
  * join, never a sort-merge join, exactly like a path-addressed scan.
  * Verified with and without a deletion vector on the small side (the
  * DV anti-join must not destroy the size estimate).
  */
class CatalogStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String =
    spark.conf.getOption("spark.sql.catalog.graft.root").getOrElse {
      val r = java.nio.file.Files.createTempDirectory("graft_catstats_")
        .toAbsolutePath.toString
      spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", r)
      r
    }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a small catalog table broadcasts into a join against a big side") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.st")
    spark.sql("CREATE TABLE graft.st.dim (k BIGINT, name STRING)")
    spark.range(0, 100).selectExpr("id AS k", "concat('n', id) AS name")
      .createOrReplaceTempView("catstats_src")
    spark.sql("INSERT INTO graft.st.dim SELECT * FROM catstats_src")

    val big = spark.range(0, 200000).selectExpr("id % 100 AS k", "id AS v")
    val joined = big.join(spark.table("graft.st.dim"), "k")
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"small catalog table did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(joined.count() == 200000)

    // the optimizer's size estimate is the files', not a default
    val stats = spark.table("graft.st.dim").queryExecution.optimizedPlan.stats
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    assert(stats.sizeInBytes.toLong > 0 && stats.sizeInBytes.toLong < threshold,
      s"sizeInBytes=${stats.sizeInBytes} vs threshold=$threshold")
  }

  test("a DV'd small catalog table still broadcasts (anti-join keeps the estimate)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.st")
    spark.sql("CREATE TABLE graft.st.dimdv (k BIGINT, name STRING) " +
      "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
    spark.range(0, 100).selectExpr("id AS k", "concat('n', id) AS name")
      .createOrReplaceTempView("catstats_dv_src")
    spark.sql("INSERT INTO graft.st.dimdv SELECT * FROM catstats_dv_src")
    spark.sql("DELETE FROM graft.st.dimdv WHERE k >= 90")
    assert(graft.sources.DeltaReader.snapshot(spark, s"$root/st/dimdv", None)
      .active.exists(_.dv.isDefined), "expected a DV merge-on-read delete")

    val big = spark.range(0, 200000).selectExpr("id % 100 AS k", "id AS v")
    val joined = big.join(spark.table("graft.st.dimdv"), "k")
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"DV'd small catalog table did not broadcast:\n$plan")
    assert(joined.count() == 180000)
  }
}
