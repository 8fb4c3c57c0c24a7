package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * `queries` maps every implemented capability to a DataFrame plan over
  * a testdata scale-factor directory; `oracleSql` gives the equivalent
  * DuckDB SQL over the same parquet tables (omitted only for
  * non-SQL-expressible ops, which get a rows>0 check).
  */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracles),
      (_root_.graft.queries.IndexQueries.queries, _root_.graft.queries.IndexQueries.oracles),
      (_root_.graft.queries.DiscoveryQueries.queries, _root_.graft.queries.DiscoveryQueries.oracles),
      (_root_.graft.queries.DupQueries.queries, _root_.graft.queries.DupQueries.oracles),
      (_root_.graft.queries.PipelineQueries.queries, _root_.graft.queries.PipelineQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
