package graft.mate

import graft.functions.{TextFunctions, Xash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MATE — top-k multi-attribute joinability search
  * (reference: maco/mate.py:125 join_search).
  *
  * Spark-first redesign: the reference's driver-side heap + per-table
  * pruning loop becomes a declarative plan — token-match join on the
  * first query column, native 128-bit super-key containment pre-filter
  * (two long compares, maco/mate.py:393), then exact per-column
  * verification joins and a global top-k. At scale the exact-k heap is
  * the part that cannot distribute; the joins can, so we compute all
  * candidate scores shuffle-parallel and `ORDER BY score LIMIT k`.
  *
  * Determinism (SURVEY.md §3): input row ids are `min(rowId)` per
  * distinct raw query-tuple (the reference keeps pandas' first
  * occurrence), matched column lists are ascending, ties break by
  * (score desc, tableid asc, columns asc), and scores are natural match
  * counts (the reference returns `score - 1`, maco/mate.py:523).
  */
object Mate {

  /** Input preparation (maco/mate.py:182-197): dedup on raw query
    * values, clean, drop ''/'nan'/'unknown', add query super key.
    * Output: (MateRowID, tok_0..tok_{n-1}, q_hi, q_lo).
    */
  def prepare(input: DataFrame, rowId: Column, queryCols: Seq[String],
              rowHash: Column => Column = graft.functions.XashKernel.superKeyCol): DataFrame = {
    val n = queryCols.length
    prepareToks(input, rowId, queryCols)
      .withColumn("sk", rowHash(array((0 until n).map(i => col(s"tok_$i")): _*)))
      .select((col("MateRowID") +: (0 until n).map(i => col(s"tok_$i")) :+
        col("sk")(0).as("q_hi") :+ col("sk")(1).as("q_lo")): _*)
  }

  /** Hash-free input preparation: dedup, clean, filter — shared by the
    * (hi, lo) and word-array prefilter paths.
    */
  private def prepareToks(input: DataFrame, rowId: Column, queryCols: Seq[String]): DataFrame = {
    val n = queryCols.length
    val raws = queryCols.zipWithIndex.map { case (c, i) => col(c).cast("string").as(s"raw_$i") }
    val grouped = input
      .select((rowId.cast("long").as("__rid") +: raws): _*)
      .groupBy((0 until n).map(i => col(s"raw_$i")): _*)
      .agg(min(col("__rid")).as("MateRowID"))
    // truncate exactly like the INDEXED tokens (LakeIndexer.cleanCol):
    // an untruncated query token can never equal its own indexed form
    // past MaxTokenLength chars — the match would silently vanish
    val toks = (0 until n).map(i =>
      substring(TextFunctions.cleanedText(coalesce(col(s"raw_$i"), lit(""))),
        1, graft.index.LakeIndexer.MaxTokenLength).as(s"tok_$i"))
    val cleaned = grouped.select((col("MateRowID") +: toks): _*)
    cleaned.where(
      (0 until n).map(i => !col(s"tok_$i").isin("", "nan", "unknown")).reduce(_ && _))
  }

  /** All verified candidate matches: (tableid, rowid, MateRowID,
    * columns) where `columns` is the matched-column-combination string
    * (first-column colid, then ascending matched colids per further
    * query column — maco/mate.py:113 evaluate_rows).
    */
  def matches(input: DataFrame, rowId: Column, queryCols: Seq[String], cells: DataFrame,
              rowHash: Column => Column = graft.functions.XashKernel.superKeyCol): DataFrame = {
    val prep = prepare(input, rowId, queryCols, rowHash)
    val q0 = broadcast(prep.select(col("MateRowID"), col("tok_0"), col("q_hi"), col("q_lo")))
    val cand = cells
      .join(q0, cells("tokenized") === q0("tok_0"))
      // hash pre-filter: no false negatives, exact verification follows
      .where(Xash.contains(col("sk_hi"), col("sk_lo"), col("q_hi"), col("q_lo")))
      .select(col("tableid"), col("rowid"), col("colid").as("c0"), col("MateRowID"))
    verifyAndCombine(cand, prep, queryCols, cells)
  }

  /** [[matches]] over a word-array index ([[graft.index.LakeIndexer
    * .cellsWords]]) at any reference XASH width — the prefilter is the
    * word-wise containment kernel instead of the two-long compare; the
    * exact verification tail is identical, so results match the default
    * path bit-for-bit at every width (the prefilter never drops a true
    * match, only admits more or fewer false candidates).
    */
  def matchesWords(input: DataFrame, rowId: Column, queryCols: Seq[String],
                   cellsW: DataFrame, hashSize: Int): DataFrame = {
    import graft.functions.XashKernel
    val n = queryCols.length
    val prepBase = prepareToks(input, rowId, queryCols)
    val prep = prepBase.withColumn("q_sk",
      XashKernel.superKeyWordsCol(array((0 until n).map(i => col(s"tok_$i")): _*), hashSize))
    val q0 = broadcast(prep.select(col("MateRowID"), col("tok_0"), col("q_sk")))
    val cand = cellsW
      .join(q0, cellsW("tokenized") === q0("tok_0"))
      .where(XashKernel.containsWordsCol(col("sk"), col("q_sk")))
      .select(col("tableid"), col("rowid"), col("colid").as("c0"), col("MateRowID"))
    verifyAndCombine(cand, prep, queryCols, cellsW)
  }

  /** Top-k search over a word-array index at any XASH width. */
  def joinSearchAt(input: DataFrame, rowId: Column, queryCols: Seq[String],
                   cellsW: DataFrame, k: Int, hashSize: Int): DataFrame =
    topkOf(matchesWords(input, rowId, queryCols, cellsW, hashSize), k)

  /** Exact per-column verification joins + matched-column combo string —
    * shared tail of every prefilter variant. `cells` only needs
    * (tableid, rowid, colid, tokenized).
    */
  private def verifyAndCombine(cand0: DataFrame, prep: DataFrame,
                               queryCols: Seq[String], cells: DataFrame): DataFrame = {
    // multi-column searches consume the candidate join twice (the
    // candidate-key set below and the verification chain's base) — and
    // that join is a full scan of the cell index, the single most
    // expensive subplan of a search. Materialize it once; single-column
    // searches consume it once and skip the checkpoint.
    val cand = if (queryCols.length > 1) cand0.localCheckpoint(true) else cand0
    var cur = cand
    if (queryCols.length > 1) {
      // materialized ONCE via eager localCheckpoint — consumed once per
      // extra query column PLUS the eager bloom build below; uncached,
      // each consumer would re-run the token-match candidate join.
      // localCheckpoint over cache() because this frame is internal to
      // one search call: its blocks are freed by the ContextCleaner as
      // soon as the plan is unreachable, where a cache() with no
      // unpersist hook (consumers execute lazily, after this method
      // returns) would pin executor storage for the session's lifetime.
      // Caveat: lineage is truncated, so an executor loss mid-query
      // fails the query instead of recomputing — acceptable for an
      // interactive search; retry re-runs the search.
      val candKeys = cand.select("tableid", "rowid", "MateRowID").distinct()
        .localCheckpoint(true)
      // Bloom-prune the per-column verification scans: each extra query
      // column re-joins the FULL cell index against the (much smaller)
      // candidate-row set — build one bloom over the candidate
      // (tableid, rowid) keys and drop non-candidate cells BEFORE their
      // shuffle. False positives just reach the exact join; no false
      // negatives. At lake scale this turns #queryCols full-index
      // shuffles into broadcast-bitset scans.
      val rowKeys = candKeys.select("tableid", "rowid").distinct()
      val prunedCells = graft.ops.BloomPrune.semiFilterMulti(
        cells.select("tableid", "rowid", "colid", "tokenized"), rowKeys,
        Seq("tableid", "rowid"), Seq("tableid", "rowid"))
      for (i <- 1 until queryCols.length) {
        val qi = broadcast(prep.select(col("MateRowID"), col(s"tok_$i")))
        val mi = prunedCells
          .join(candKeys, Seq("tableid", "rowid"))
          .join(qi, Seq("MateRowID"))
          .where(col("tokenized") === col(s"tok_$i"))
          .groupBy("tableid", "rowid", "MateRowID")
          .agg(concat_ws("_",
            transform(array_sort(collect_set(col("colid"))), _.cast("string"))).as(s"m_$i"))
        cur = cur.join(mi, Seq("tableid", "rowid", "MateRowID"))
      }
    }
    val combo = concat_ws("_",
      (col("c0").cast("string") +: (1 until queryCols.length).map(i => col(s"m_$i"))): _*)
    cur.select(col("tableid"), col("rowid"), col("MateRowID"), combo.as("columns"))
  }

  /** Top-k joinable tables: (tableid, columns, joinability). */
  def joinSearch(input: DataFrame, rowId: Column, queryCols: Seq[String],
                 cells: DataFrame, k: Int,
                 rowHash: Column => Column = graft.functions.XashKernel.superKeyCol): DataFrame =
    topkOf(matches(input, rowId, queryCols, cells, rowHash), k)

  /** Score + top-k over an (optionally pre-cached) match set — public so
    * callers that materialize the match set once (the reference's
    * join-map product) can run search and map projection off the same
    * frame without recomputing the candidate joins.
    */
  def topK(matched: DataFrame, k: Int): DataFrame = topkOf(matched, k)

  /** Join-map projection of a match set restricted to `top`'s tables:
    * external row → input row (min MateRowID per external row).
    */
  def mapsOf(matched: DataFrame, top: DataFrame): DataFrame =
    matched
      .join(broadcast(top.select("tableid", "columns")), Seq("tableid", "columns"))
      .groupBy("tableid", "columns", "rowid")
      .agg(min("MateRowID").as("input_row"))

  private def topkOf(matched: DataFrame, k: Int): DataFrame = {
    val scored = matched
      .groupBy("tableid", "columns")
      .agg(count(lit(1)).as("joinability"))
    val best = Window.partitionBy("tableid")
      .orderBy(col("joinability").desc, col("columns").asc)
    scored
      .withColumn("rk", row_number().over(best)).where(col("rk") === 1).drop("rk")
      .orderBy(col("joinability").desc, col("tableid").asc)
      .limit(k)
  }

  /** Join maps for the top-k tables (maco/mate.py:473): external row →
    * input row (min MateRowID per external row, deterministic). The
    * match set is computed once and cached — scoring/topk and the map
    * projection both read it.
    */
  def joinMaps(input: DataFrame, rowId: Column, queryCols: Seq[String],
               cells: DataFrame, k: Int): DataFrame =
    searchAndMaps(input, rowId, queryCols, cells, k)._2

  /** Top-k result AND its join maps off one cached match set.
    *
    * The top-k frame is materialized to a k-row LOCAL relation (k is a
    * user constant — this is a bounded driver collect at any lake
    * scale): every downstream consumer broadcasts it — the map
    * projection here, COCOA's candidate-table and excluded-column
    * filters — and as a local relation those broadcasts are free
    * instead of each re-executing the score+topk subplan.
    */
  def searchAndMaps(input: DataFrame, rowId: Column, queryCols: Seq[String],
                    cells: DataFrame, k: Int): (DataFrame, DataFrame) =
    // localCheckpoint over cache() for the same reason as candKeys in
    // verifyAndCombine: this frame is returned with no unpersist hook,
    // and a cache() would pin executor storage for the session's
    // lifetime; checkpoint blocks are GC-freed once unreachable
    searchAndMapsOf(matches(input, rowId, queryCols, cells).localCheckpoint(true), k)

  /** [[searchAndMaps]] over an already-materialized match set. */
  def searchAndMapsOf(matched: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val spark = matched.sparkSession
    val topKDf = topkOf(matched, k)
    val top = spark.createDataFrame(
      spark.sparkContext.parallelize(topKDf.collect().toIndexedSeq, 1), topKDf.schema)
    // materialized once: the maps ARE the reference's join-map product,
    // and COCOA consumes them several times (candidate tables, pair
    // join); localCheckpoint for the same lifecycle reason as above
    val maps = mapsOf(matched, top).localCheckpoint(true)
    (top, maps)
  }
}
