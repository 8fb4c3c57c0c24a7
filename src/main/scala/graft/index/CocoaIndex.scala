package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ONE definition of the reference's cell-value semantics
  * (maco/util.py:58): which tokens count as numeric, how a token
  * parses to a sort value, how parse-NaN normalizes to missing, and
  * the value key missing ties under. The order-index builder
  * ([[CocoaIndex]]) and the relational correlation path
  * (graft.cocoa.Cocoa) MUST stay bit-identical on these — that
  * identity is the `cocoa_from_index` ≡ `cocoa_enrich` contract — so
  * the expressions live once, here.
  */
object CellValues {
  /** '' and 'nan' count as numeric (NaN); otherwise float-parseable. */
  def tryDouble: Column = expr("try_cast(tokenized AS double)")
  def tokNumeric: Column =
    col("tokenized").isin("", "nan") || tryDouble.isNotNull
  def vnumRaw: Column =
    when(col("tokenized").isin("", "nan"), lit(null).cast("double")).otherwise(tryDouble)
  /** NaN from cast('nan') normalizes to null so all missing tie. */
  def normalizeNan(c: Column): Column =
    when(isnan(coalesce(c, lit(0.0))), lit(null).cast("double")).otherwise(c)
  /** Tie key: numeric by parsed value (missing → ' nan' sentinel,
    * which no cleaned token can collide with), else the string.
    */
  def valKey(vnum: Column, str: Column): Column =
    when(col("is_numeric"), coalesce(vnum.cast("string"), lit(" nan"))).otherwise(str)
}

/** COCOA order index (reference: maco/util.py:34 create_cocoa_index,
  * stored via maco/data_handler.py:312).
  *
  * Per table column: average-tie ranks, the rank-sorted successor linked
  * list (`order_list`), the equal-to-next bitmap (`binary_list`), the
  * row id of the minimum (`min_index`) and numericness.
  *
  * Spark-first: ranks and successors come from window functions over
  * `(table_col_id)` partitions — one shuffle, no driver loop. The packed
  * per-column arrays exist only in the persisted index product (the
  * reference's storage format); COCOA correlation in graft recomputes
  * ranks relationally and never walks arrays.
  */
object CocoaIndex {

  /** Augments cells with the per-column sort value and numericness.
    *
    * Column-wide numericness rides a window over `table_col_id`: the
    * downstream rank windows partition by the SAME key, so Catalyst reuses
    * one exchange for both (an aggregate+broadcast-join variant was
    * measured slower — it re-executes the upstream plan for the aggregate
    * pass). Per-column colocation is inherent to ranking a column; this
    * adds no extra shuffle to it.
    */
  def withSortValue(cells: DataFrame): DataFrame = {
    val colNumeric = min(when(CellValues.tokNumeric, 1).otherwise(0))
      .over(Window.partitionBy("table_col_id")) === 1
    cells
      .withColumn("is_numeric", colNumeric)
      .withColumn("vnum", when(col("is_numeric"), CellValues.vnumRaw))
      .withColumn("vnum", CellValues.normalizeNan(col("vnum")))
  }

  /** Long form of the index: one row per cell with rank, successor row
    * id in rank order (-1 for the maximum) and the equal-to-next bit.
    */
  def longForm(cells: DataFrame): DataFrame = {
    val sorted = withSortValue(cells)
    // Rank order: numeric → by value NULLS LAST (na_option='bottom'),
    // else lexicographic; rowid breaks ties deterministically.
    val ord = Window.partitionBy("table_col_id")
      .orderBy(col("is_numeric").desc, // constant within partition
        col("vnum").asc_nulls_last, col("tokenized").asc, col("rowid").asc)
    val valKey = CellValues.valKey(col("vnum"), col("tokenized"))
    val tieW = Window.partitionBy(col("table_col_id"), valKey)
    sorted
      .withColumn("rn", row_number().over(ord))
      .withColumn("rank", avg(col("rn")).over(tieW)) // average-tie rank
      .withColumn("succ", coalesce(lead(col("rowid"), 1).over(ord), lit(-1L)))
      .withColumn("next_key", lead(valKey, 1).over(ord))
      .withColumn("is_last", lead(col("rowid"), 1).over(ord).isNull)
      // null-safe: two missing values count as equal (maco/util.py:125)
      .withColumn("bin", when(col("is_last") || col("next_key").eqNullSafe(valKey), lit("0")).otherwise(lit("1")))
  }

  /** Packed index product: (table_col_id, is_numeric, min_index,
    * order_list, binary_list) — arrays indexed by rowid, matching the
    * reference storage layout (maco/data_handler.py:49).
    */
  def build(cells: DataFrame): DataFrame =
    longForm(cells)
      .groupBy("table_col_id")
      .agg(
        first(col("is_numeric")).as("is_numeric"),
        min(when(col("rn") === 1, col("rowid"))).as("min_index"),
        transform(array_sort(collect_list(struct(col("rowid"), col("succ")))), x => x("succ")).as("order_list"),
        concat_ws("", transform(array_sort(collect_list(struct(col("rowid"), col("bin")))), x => x("bin"))).as("binary_list"))

  /** Scalar per-column stats (SQL-expressible → DuckDB oracle):
    * numericness, min_index, row count, distinct values, number of '1'
    * bits in binary_list (= distinct groups - 1).
    */
  def stats(cells: DataFrame): DataFrame =
    longForm(cells)
      .groupBy("table_col_id")
      .agg(
        first(col("is_numeric")).cast("int").as("is_numeric"),
        min(when(col("rn") === 1, col("rowid"))).as("min_index"),
        count(lit(1)).as("n_rows"),
        sum(when(col("bin") === "1", 1L).otherwise(0L)).as("ones"))
      .orderBy("table_col_id")
}
