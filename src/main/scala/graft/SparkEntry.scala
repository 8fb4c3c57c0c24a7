package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

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
      (_root_.graft.queries.PipelineQueries.queries, _root_.graft.queries.PipelineQueries.oracles),
      (_root_.graft.queries.DeltaQueries.queries, _root_.graft.queries.DeltaQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  /** Exact money/stat arithmetic runs in decimal inside every query; the
    * RESULT surface is double. Rationale: the driver's compare reads our
    * parquet with pyarrow (decimals stay `Decimal('138014.00')`, stringified
    * with trailing zeros) but reads the DuckDB oracle through pandas
    * (decimals become float64, '138014.0') — value-equal frames hash
    * differently. Decimal→double is correctly rounded on both sides
    * (BigDecimal.doubleValue / duckdb decimal cast), so converting the final
    * projection converges the representations without giving up exact,
    * associative partial aggregation inside the plan.
    */
  private def decimalsAsDouble(df: DataFrame): DataFrame = {
    val needs = df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType])
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _              => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _).map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => decimalsAsDouble(fn(s, dir)))
    }

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
