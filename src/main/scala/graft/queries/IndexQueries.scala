package graft.queries

import graft.functions.{BloomHash, SimHash, TextFunctions, Xash}
import graft.index.{CocoaIndex, LakeIndexer, TestLake}
import graft.sources.LakeReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index & tokenization layer — SURVEY.md §2.1. */
object IndexQueries {
  import Q._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 1. reference tokenizer over the documents corpus
    "tok_clean" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.cleanedText(col("text")).as("tok"))
        .orderBy("doc_id")
    }),

    // 3. inverted cell index over the demo lake (tokens part checked
    // against SQL; super keys covered by xash_index + unit vectors)
    "cell_index" -> ((s, dir) => {
      TestLake.cells(s, dir)
        .select("tokenized", "tableid", "colid", "rowid", "table_col_id")
        .orderBy("tableid", "rowid", "colid")
    }),

    // 7b. the SAME cell index built through the merged wide-lake path
    // (readFolderMerged + cellsMerged over a folder of csv files): the
    // ingestion design a 10^4-table lake actually uses, checked
    // rows+schema+hash against the same oracle shape as cell_index
    "cell_index_merged" -> ((s, dir) => {
      TestLake.cellsMergedDemo(s, dir)
        .select("tokenized", "tableid", "colid", "rowid", "table_col_id")
        .orderBy("tableid", "rowid", "colid")
    }),

    // posting-list retrieval for a token set (the reference's
    // get_concatinated_posting_list surface)
    "posting_list" -> ((s, dir) =>
      graft.index.LakeIndexer.postingList(TestLake.cells(s, dir),
        Seq("germany", "france", "automobile")).orderBy("pl")),

    // 2. XASH super keys per row (not SQL-expressible → rows-only)
    "xash_index" -> ((s, dir) => {
      TestLake.cells(s, dir)
        .select("tableid", "rowid", "sk_hi", "sk_lo")
        .distinct()
        .orderBy("tableid", "rowid")
    }),

    // 4. column headers
    "col_headers" -> ((s, dir) =>
      LakeIndexer.columnHeaders(s, TestLake.tables(s, dir))
        .orderBy("tableid", "colid")),

    // 5. table info
    "table_info" -> ((s, dir) =>
      LakeIndexer.tableInfo(TestLake.tables(s, dir))
        .orderBy("tableid")),

    // 5b. table info through the merged wide-lake path: catalog-driven
    // left join against per-group counts (the zero-row-safe form),
    // same oracle shape as table_info under the merged tableids
    "table_info_merged" -> ((s, dir) =>
      TestLake.tableInfoMergedDemo(s, dir).orderBy("tableid")),

    // 6. COCOA order index — scalar stats vs SQL oracle...
    "cocoa_index_stats" -> ((s, dir) =>
      CocoaIndex.stats(TestLake.cells(s, dir))),

    // ...and the packed array product (rows-only)
    "cocoa_index_full" -> ((s, dir) =>
      CocoaIndex.build(TestLake.cells(s, dir))
        .select(col("table_col_id"), col("is_numeric"), col("min_index"),
          size(col("order_list")).as("order_len"), length(col("binary_list")).as("bin_len"))
        .orderBy("table_col_id")),

    // 7. multi-format ingestion: parquet → csv/tsv/json → same counts
    "lake_ingest" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val tmp = java.nio.file.Files.createTempDirectory("graft_lake_").toString
      nation.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation.csv")
      nation.write.mode("overwrite").option("header", "true").option("delimiter", "\t").csv(s"$tmp/nation.tsv")
      nation.write.mode("overwrite").json(s"$tmp/nation.json")
      Seq("csv", "tsv", "json").map { f =>
        LakeReader.read(s, s"$tmp/nation.$f", Some(nation.schema))
          .agg(count(lit(1)).as("n"), sum(col("n_nationkey").cast("long")).as("key_sum"))
          .select(lit(f).as("fmt"), col("n"), col("key_sum"))
      }.reduce(_ unionByName _).orderBy("fmt")
    }),

    // 8. MD5 token hash (maco/util.py:227) via built-in md5
    "md5_tokens" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          md5(TextFunctions.cleanedText(col("p_name"))).as("h"))
        .orderBy("p_partkey")
    }),

    // 9. SimHash fingerprints: fast 64-bit mode + the reference-exact
    // 128-bit md5 mode (rows-only; both pinned by unit vectors)
    "simhash_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), SimHash.simhashUdf(col("text")).as("sh"),
          SimHash.simhash128Udf(col("text")).as("sh128"))
        .select(col("doc_id"), col("sh"),
          col("sh128._1").as("sh128_hi"), col("sh128._2").as("sh128_lo"))
        .orderBy("doc_id")
    }),

    // 9b. the reference-exact md5 SimHash proven against a fully
    // INDEPENDENT SQL reimplementation (3-gram features, per-bit md5
    // majority vote) — upgrades the md5 mode from unit-vector-pinned
    // to oracle-checked end to end
    "simhash128_ref" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), SimHash.simhash128Udf(col("p_name")).as("sh"))
        .select(col("p_partkey"),
          col("sh._1").as("sh128_hi"), col("sh._2").as("sh128_lo"))
        .orderBy("p_partkey")),

    // 10. Bloom-filter row hashes over the customer table (rows-only)
    "bloom_rowhash" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val toks = array(c.columns.map(cn =>
        TextFunctions.cleanedText(coalesce(col(cn).cast("string"), lit("")))): _*)
      c.select(col("c_custkey"), BloomHash.rowHashUdf(toks).as("bf"))
        .select(col("c_custkey"), col("bf._1").as("bf_hi"), col("bf._2").as("bf_lo"))
        .orderBy("c_custkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "tok_clean" ->
      s"SELECT doc_id, ${TextFunctions.cleanedTextSql("text")} AS tok FROM documents ORDER BY doc_id",

    "cell_index" ->
      s"SELECT * FROM (${TestLake.cellsSql}) ORDER BY tableid, rowid, colid",

    "cell_index_merged" ->
      s"SELECT * FROM (${TestLake.cellsMergedSql}) ORDER BY tableid, rowid, colid",

    "posting_list" ->
      s"""SELECT tableid || '_' || rowid || ';' || colid || '_' || tokenized AS pl
         |FROM (${TestLake.cellsSql})
         |WHERE tokenized IN ('germany', 'france', 'automobile') ORDER BY pl""".stripMargin,

    "col_headers" -> TestLake.spec.flatMap { case (id, _, _, cols) =>
      cols.zipWithIndex.map { case (c, i) =>
        val tok = TextFunctions.cleanedTextLocal(c)
        s"SELECT $id AS tableid, $i AS colid, '$c' AS header, '$tok' AS header_tokenized"
      }
    }.mkString("", " UNION ALL ", " ORDER BY tableid, colid"),

    "table_info" -> TestLake.spec.map { case (id, name, _, cols) =>
      s"SELECT $id AS tableid, '$name' AS dataset_name, (SELECT count(*) FROM $name) AS max_row_id, ${cols.length - 1} AS max_col_id"
    }.mkString("", " UNION ALL ", " ORDER BY tableid"),

    "table_info_merged" -> TestLake.mergedSpec.map { case (id, (_, name, _, cols)) =>
      s"SELECT $id AS tableid, '$name.csv' AS dataset_name, (SELECT count(*) FROM $name) AS max_row_id, ${cols.length - 1} AS max_col_id"
    }.mkString("", " UNION ALL ", " ORDER BY tableid"),

    "cocoa_index_stats" ->
      s"""WITH cells AS (${TestLake.cellsSql}),
         |c1 AS (SELECT table_col_id, rowid, tokenized,
         |        (tokenized IN ('','nan') OR TRY_CAST(tokenized AS DOUBLE) IS NOT NULL) AS tok_num,
         |        CASE WHEN tokenized IN ('','nan') THEN NULL ELSE TRY_CAST(tokenized AS DOUBLE) END AS vnum0
         |       FROM cells),
         |c2 AS (SELECT *, bool_and(tok_num) OVER (PARTITION BY table_col_id) AS is_numeric FROM c1),
         |c3 AS (SELECT table_col_id, rowid, tokenized, is_numeric,
         |        CASE WHEN is_numeric THEN (CASE WHEN isnan(vnum0) THEN NULL ELSE vnum0 END) END AS vnum
         |       FROM c2),
         |c4 AS (SELECT *, CASE WHEN is_numeric THEN coalesce(CAST(vnum AS VARCHAR), ' nan') ELSE tokenized END AS valkey FROM c3),
         |c5 AS (SELECT *, row_number() OVER w AS rn, lead(valkey) OVER w AS next_key,
         |        lead(rowid) OVER w IS NULL AS is_last
         |       FROM c4 WINDOW w AS (PARTITION BY table_col_id ORDER BY vnum ASC NULLS LAST, tokenized ASC, rowid ASC))
         |SELECT table_col_id, CAST(max(CASE WHEN is_numeric THEN 1 ELSE 0 END) AS INT) AS is_numeric,
         |  min(CASE WHEN rn = 1 THEN rowid END) AS min_index,
         |  count(*) AS n_rows,
         |  CAST(sum(CASE WHEN NOT is_last AND (next_key IS DISTINCT FROM valkey) THEN 1 ELSE 0 END) AS BIGINT) AS ones
         |FROM c5 GROUP BY table_col_id ORDER BY table_col_id""".stripMargin,

    "lake_ingest" ->
      Seq("csv", "json", "tsv").map(f =>
        s"SELECT '$f' AS fmt, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum FROM nation")
        .mkString("", " UNION ALL ", " ORDER BY fmt"),

    "md5_tokens" ->
      s"SELECT p_partkey, md5(${TextFunctions.cleanedTextSql("p_name")}) AS h FROM part ORDER BY p_partkey",

    // A fully independent reimplementation of the reference-exact md5
    // SimHash (maco/util.py:250): 3-gram features of the lowercased
    // word-stripped name (whole remainder when shorter), one md5 per
    // feature, bit i of the 128-bit digest voted +1/-1 across features,
    // bit set on a strictly positive vote; the two unsigned halves
    // reinterpreted as signed 64-bit to match the Spark longs.
    "simhash128_ref" ->
      """WITH toks AS (
        |  SELECT p_partkey AS k,
        |         regexp_replace(lower(p_name), '[^a-z0-9_]+', '', 'g') AS t
        |  FROM part
        |),
        |feats AS (
        |  SELECT k, CASE WHEN length(t) <= 3 THEN t ELSE substr(t, CAST(i AS INT), 3) END AS f
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(length(t) - 2, 1))) AS i) g
        |),
        |votes AS (
        |  SELECT k, i,
        |    SUM(CASE WHEN ((strpos('0123456789abcdef', substr(md5(f), CAST(32 - i // 4 AS INT), 1)) - 1) >> (i % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM feats, (SELECT unnest(generate_series(0, 127)) AS i) bb
        |  GROUP BY k, i
        |),
        |num AS (
        |  SELECT k,
        |    SUM(CASE WHEN v > 0 AND i < 64 THEN CAST(1 AS HUGEINT) << CAST(i AS INT) ELSE 0 END) AS lo_u,
        |    SUM(CASE WHEN v > 0 AND i >= 64 THEN CAST(1 AS HUGEINT) << CAST(i - 64 AS INT) ELSE 0 END) AS hi_u
        |  FROM votes GROUP BY k
        |)
        |SELECT k AS p_partkey,
        |  CAST(CASE WHEN hi_u >= CAST(9223372036854775808 AS HUGEINT) THEN hi_u - CAST(18446744073709551616 AS HUGEINT) ELSE hi_u END AS BIGINT) AS sh128_hi,
        |  CAST(CASE WHEN lo_u >= CAST(9223372036854775808 AS HUGEINT) THEN lo_u - CAST(18446744073709551616 AS HUGEINT) ELSE lo_u END AS BIGINT) AS sh128_lo
        |FROM num ORDER BY p_partkey""".stripMargin
  )
}
