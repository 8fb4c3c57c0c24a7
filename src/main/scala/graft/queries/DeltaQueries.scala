package graft.queries

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta write-path harness rows — the mutation surface (DELETE /
  * DV-DELETE / UPDATE / MERGE / time travel) checked against DuckDB
  * oracles, not just specs. Each query builds a throwaway Delta table
  * from a deterministic modulo-subset of `orders`, applies ONE
  * mutation through the production writer, reads the table back
  * through the production reader, and aggregates — so the oracle can
  * express the post-mutation state as plain SQL over the same parquet.
  *
  * The temp table is fresh per invocation (bench runs every query
  * twice; Verify once) and tiny by construction: the modulo filters
  * keep the staged data at a fraction of `orders`, so the rows time
  * the write machinery, not bulk IO.
  */
object DeltaQueries {
  import Q._

  /** Fresh table dir under java.io.tmpdir; the dir itself is the
    * table root (DeltaReader refuses a pre-existing non-empty dir
    * only via the log, so a unique path per call keeps runs isolated).
    */
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dq_$tag").resolve("tbl")
      .toAbsolutePath.toString

  /** The shared result surface: per-status row count + exact money
    * total (decimal inside, double on the result — SparkEntry's
    * convention).
    */
  private def statusAgg(df: DataFrame): DataFrame =
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"))
      .orderBy("o_orderstatus")

  private val aggSql =
    """SELECT o_orderstatus, COUNT(*) AS cnt,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // copy-on-write DELETE: half the files hold matching rows, their
    // survivors rewrite, tombstones land, latest snapshot loses the rows
    // driven through the SQL DML surface (the injected parser routes
    // the statement to LakeWriter.deleteWhere) — the oracle row now
    // proves the SQL path end-to-end, not just the DataFrame API
    "delta_delete" -> ((s, dir) => {
      val d = freshDir("del")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      s.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 3 = 0")
      statusAgg(DeltaReader.read(s, d))
    }),

    // the V2 TableCatalog surface end-to-end BY NAME: the table is
    // created under the catalog root, mutated through name-addressed
    // SQL DML (DELETE then UPDATE — both resolve graft.db.t through
    // GraftCatalogPaths onto the same production writers), and read
    // back through spark.table + the catalog scan rule. The catalog
    // registers once per JVM (catalog instances pin their root at
    // initialize); each invocation gets a fresh table NAME, which is
    // the isolation a catalog user actually has
    "delta_catalog" -> ((s, dir) => {
      val root = s.conf.getOption("spark.sql.catalog.graft.root").getOrElse {
        val r = java.nio.file.Files.createTempDirectory("graft_dq_cat_")
          .toAbsolutePath.toString
        s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft.root", r)
        r
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.bench")
      val tbl = s"orders_${java.util.UUID.randomUUID().toString.take(8)}"
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4),
        s"$root/bench/$tbl")
      s.sql(s"DELETE FROM graft.bench.$tbl WHERE o_orderkey % 3 = 2")
      s.sql(s"UPDATE graft.bench.$tbl SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'O'")
      statusAgg(s.table(s"graft.bench.$tbl"))
    }),

    // deletion-vector DELETE: same table shape, but the delete writes
    // DV sidecars instead of rewriting files; the read-side anti-join
    // must drop exactly the marked rows
    "delta_dv_delete" -> ((s, dir) => {
      val d = freshDir("dvdel")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      LakeWriter.deleteWhereDv(s, d, "o_orderkey % 3 = 1")
      statusAgg(DeltaReader.read(s, d))
    }),

    // copy-on-write UPDATE: matching rows take the SET expressions
    // (exact binary doubling, so the double surface agrees with DuckDB
    // bit-for-bit), non-matching rows in rewritten files copy through
    // driven through SQL (routes to LakeWriter.updateWhere)
    "delta_update" -> ((s, dir) => {
      val d = freshDir("upd")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      s.sql(s"UPDATE graft_delta.`$d` SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'F'")
      statusAgg(DeltaReader.read(s, d))
    }),

    // MERGE INTO (upsert): keys 4-5 mod 10 match and take the source
    // row (status 'M', price ×3 — exact in binary); keys 6-7 mod 10
    // miss and insert; untouched target rows copy through
    "delta_merge" -> ((s, dir) => {
      val d = freshDir("mrg")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      val source = t(s, dir, "orders")
        .where("o_orderkey % 10 >= 4 AND o_orderkey % 10 < 8")
        .withColumn("o_orderstatus", lit("M"))
        .withColumn("o_totalprice", col("o_totalprice") * 3)
      // driven through SQL (routes to LakeWriter.mergeInto on the
      // ON-clause key); the source rides in as a temp view
      source.createOrReplaceTempView("graft_merge_src")
      s.sql(
        s"""MERGE INTO graft_delta.`$d` AS t USING graft_merge_src AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      statusAgg(DeltaReader.read(s, d))
    }),

    // full Delta→Delta REPLICATION: a CDF source table (delete +
    // update + append churn) streamed through the registered
    // readStream CDF source into the cdcApply clause-merge sink; the
    // REPLICA is aggregated, the oracle recomputes the SOURCE's final
    // state — replica ≡ source is the whole point
    "delta_replicate" -> ((s, dir) => {
      val src = freshDir("repsrc"); val dst = freshDir("repdst")
      val cp = freshDir("repcp")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), src,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      LakeWriter.deleteWhere(s, src, "o_orderkey % 3 = 0")
      LakeWriter.updateWhere(s, src, "o_orderstatus = 'F'",
        Map("o_totalprice" -> "o_totalprice * 2"))
      LakeWriter.appendDelta(
        t(s, dir, "orders")
          .where("o_orderkey % 10 >= 6 AND o_orderkey % 10 < 8").repartition(2), src)
      val q = s.readStream.format("graft-delta")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "o_orderkey").option("cdcApply", "true")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
      statusAgg(DeltaReader.read(s, dst))
    }),

    // the GENERAL MERGE (CDC apply) through the SQL clause grammar:
    // op D deletes matched rows, other matched rows take a column-wise
    // SET, non-D misses insert — one atomic commit, first-match-wins
    "delta_merge_cdc" -> ((s, dir) => {
      val d = freshDir("mcdc")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      t(s, dir, "orders").where("o_orderkey % 4 = 1")
        .withColumn("op", expr(
          "CASE WHEN o_orderkey % 3 = 0 THEN 'D' WHEN o_orderkey % 2 = 0 THEN 'U' ELSE 'I' END"))
        .createOrReplaceTempView("graft_cdc_changes")
      s.sql(
        s"""MERGE INTO graft_delta.`$d` AS t USING graft_cdc_changes AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice * 2
           |WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *""".stripMargin)
      statusAgg(DeltaReader.read(s, d))
    }),

    // Z-order compaction: layout-only rewrite (dataChange=false) —
    // the read after OPTIMIZE ZORDER must reproduce the rows exactly
    "delta_zorder" -> ((s, dir) => {
      val d = freshDir("zo")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      // driven through the SQL maintenance statement (routes to
      // compactDeltaZOrder; default filesPerPartition)
      s.sql(s"OPTIMIZE graft_delta.`$d` ZORDER BY (o_custkey, o_totalprice)")
      statusAgg(DeltaReader.read(s, d))
    }),

    // VARIANT column: semi-structured JSON built from orders rows,
    // stored as the protocol's variantType, mutated, then extracted
    // back to typed values — the aggregate must equal the raw columns
    "delta_variant" -> ((s, dir) => {
      val d = freshDir("var")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 5")
          .selectExpr("o_orderkey", "o_orderstatus",
            "parse_json(concat('{\"price\":', " +
              "cast(cast(o_totalprice as decimal(18,2)) as string), " +
              "',\"cust\":', o_custkey, '}')) as v")
          .repartition(3), d)
      s.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 7 = 0")
      DeltaReader.read(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(expr("variant_get(v, '$.cust', 'long')")).as("cust_sum"),
          sum(expr("variant_get(v, '$.price', 'decimal(18,2)')"))
            .cast("decimal(18,2)").as("total"))
        .orderBy("o_orderstatus")
    }),

    // TYPE WIDENING: the table starts with an INT key column (narrow
    // parquet files), widens to BIGINT via SQL (one metadata commit),
    // then appends native-BIGINT rows — the aggregate reads int and
    // long files through ONE declared schema, up-cast by the reader
    "delta_widen" -> ((s, dir) => {
      val d = freshDir("wd")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 5")
          .withColumn("o_custkey", col("o_custkey").cast("int")).repartition(3), d)
      s.sql(s"ALTER TABLE graft_delta.`$d` ALTER COLUMN o_custkey TYPE BIGINT")
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 IN (5, 6)").repartition(2), d)
      DeltaReader.read(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_custkey")).cast("long").as("cust_sum"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"))
        .orderBy("o_orderstatus")
    }),

    // REORG APPLY (PURGE) + DROP FEATURE: a DV-delete campaign, its
    // debt materialized (only DV'd files rewrite), the protocol
    // DOWNGRADED past the feature (checkpointed history), then a
    // copy-on-write delete on the downgraded table — the read must
    // equal both deletes applied
    "delta_reorg" -> ((s, dir) => {
      val d = freshDir("ro")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      s.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 7 = 0") // routes to DVs
      s.sql(s"REORG TABLE graft_delta.`$d` APPLY (PURGE)")
      s.sql(s"ALTER TABLE graft_delta.`$d` DROP FEATURE deletionVectors TRUNCATE HISTORY")
      s.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 11 = 0") // copy-on-write now
      statusAgg(DeltaReader.read(s, d))
    }),

    // clustered table (liquid clustering's format shape): CLUSTER BY
    // declared as domain metadata, then plain OPTIMIZE re-layouts
    // along the 3-column curve (string + money + key — exercises the
    // prefix-rank string dimension and the k=3 interleave). Layout-only
    // (dataChange=false): the read must reproduce the rows exactly
    "delta_cluster" -> ((s, dir) => {
      val d = freshDir("cl")
      val src = t(s, dir, "orders").where("o_orderkey % 10 < 7")
      LakeWriter.writeDelta(src.repartition(4), d)
      LakeWriter.clusterBy(s, d, Seq("o_orderpriority", "o_totalprice", "o_custkey"))
      s.sql(s"OPTIMIZE graft_delta.`$d`")
      statusAgg(DeltaReader.read(s, d))
    }),

    // TABLE MAINTENANCE end-to-end: a mutated table runs the nightly
    // policy (compaction + checkpoint cadence + LITE vacuum — the
    // log-driven reclaim) and the post-maintenance read must equal the
    // plain recompute; the reclaim is REQUIRED to have freed the
    // rewrite's tombstones (files, not a no-op pass)
    "delta_maintenance" -> ((s, dir) => {
      val d = freshDir("mnt")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(6), d)
      s.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 7 = 0")
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 >= 8").repartition(2), d)
      val report = graft.sources.TableMaintenance.maintainTable(s, d,
        compactMinFiles = 2, checkpointEvery = 2, retainVersions = 1,
        vacuumLite = true)
      require(report.compacted, s"maintenance skipped compaction: $report")
      require(report.vacuumed > 0, s"LITE vacuum reclaimed nothing: $report")
      statusAgg(DeltaReader.read(s, d))
    }),

    // WRITE-TIME FILE SIZING: optimizeWrite folds each batch's 8 task
    // files to one staged add, autoCompact folds the accumulating
    // per-batch debt once it reaches minNumFiles — after a create + 4
    // tiny appends the table holds a BOUNDED file count (required
    // loudly) and exactly the union of the batches' rows
    "delta_sizing" -> ((s, dir) => {
      val d = freshDir("sz")
      val src = t(s, dir, "orders").where("o_orderkey % 10 < 6")
      s.conf.set("spark.graft.delta.autoCompact.minNumFiles", "4")
      try {
        LakeWriter.writeDelta(src.where("o_orderkey % 5 = 0").repartition(8), d,
          configuration = Map(
            "delta.autoOptimize.optimizeWrite" -> "true",
            "delta.autoOptimize.autoCompact" -> "true"))
        (1 to 4).foreach { k =>
          LakeWriter.appendDelta(src.where(s"o_orderkey % 5 = $k").repartition(8), d)
        }
        val n = DeltaReader.snapshot(s, d, None).active.size
        require(n <= 4, s"write-time sizing failed to bound the file count: $n live files")
        statusAgg(DeltaReader.read(s, d))
      } finally s.conf.unset("spark.graft.delta.autoCompact.minNumFiles")
    }),

    // schema evolution: even keys land at v0 with the base schema,
    // odd keys evolve-append a new o_bucket column at v1; the latest
    // read null-fills the old rows
    "delta_evolve" -> ((s, dir) => {
      val d = freshDir("evo")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 2 = 0").repartition(2), d)
      LakeWriter.appendDeltaEvolve(
        t(s, dir, "orders").where("o_orderkey % 2 = 1")
          .withColumn("o_bucket", expr("o_orderkey % 4")).repartition(2), d)
      DeltaReader.read(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"),
          count(col("o_bucket")).as("bucket_cnt"),
          sum(col("o_bucket")).cast("long").as("bucket_sum"))
        .orderBy("o_orderstatus")
    }),

    // Change Data Feed: an UPDATE on a CDF table writes pre+post
    // images as change data; readChanges replays them per version
    // ROW TRACKING: enable+backfill (ids 0..n-1), a DV delete (the
    // id-STABLE delete — survivors keep identities), then an append
    // (fresh ids extend the sequence). The id VALUES depend on file
    // packing, but the invariants don't: row count, id uniqueness
    // (n_ids = n_rows), the max id (backfill count + append count - 1,
    // unaffected by the DV delete), and exactly two distinct
    // defaultRowCommitVersions (backfill v1 carried through the DV
    // re-add, append v3) — all derivable by the oracle from counts.
    "delta_row_tracking" -> ((s, dir) => {
      val d = freshDir("rt")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      LakeWriter.enableRowTracking(s, d)
      LakeWriter.deleteWhereDv(s, d, "o_orderkey % 7 = 0")
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 >= 8").repartition(2), d)
      DeltaReader.readWithRowIds(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("_row_id")).as("n_ids"),
        max(col("_row_id")).as("max_id"),
        countDistinct(col("_row_commit_version")).as("n_versions"))
    }),

    // INCREMENTAL VIEW MAINTENANCE: a per-status SUM/COUNT view
    // maintained from the change feed — initial materialization at v0,
    // then two incremental refreshes fold the update (v1) and the
    // delete+append (v2, v3) WITHOUT rescanning the table. The 'P'
    // group is deleted whole, so its view row must vanish (count
    // reaches zero), and the oracle recomputes the final state from
    // scratch — equality proves delta-folding ≡ full aggregation.
    "delta_ivm" -> ((s, dir) => {
      val d = freshDir("ivm")
      val state = freshDir("ivmst")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      val keys = Seq("o_orderstatus")
      val value = col("o_totalprice")
      graft.streaming.ViewMaintain.maintain(s, d, state, keys, value)
      LakeWriter.updateWhere(s, d, "o_orderstatus = 'F'",
        Map("o_totalprice" -> "o_totalprice * 2"))
      graft.streaming.ViewMaintain.maintain(s, d, state, keys, value)
      LakeWriter.deleteWhere(s, d, "o_orderstatus = 'P'")
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 >= 8").repartition(2), d)
      graft.streaming.ViewMaintain.maintain(s, d, state, keys, value)
      graft.streaming.ViewMaintain.readView(s, state)
        .orderBy("o_orderstatus")
    }),

    // The REGISTERED streaming source, end-to-end: the same table and
    // mutations as delta_ivm, but the view state is folded from
    // `spark.readStream.format("graft-delta")` CDF batches (whole
    // history from version 0, rate-limited to 2 versions/trigger so
    // the fold crosses several real micro-batches). Each batch's
    // signed per-key delta is a distributed aggregation; the folded
    // state is status-count-sized (bounded by the key domain). The
    // oracle recomputes the final aggregate from scratch — equality
    // proves streamed-CDF-folding ≡ full aggregation, through the
    // standard readStream API instead of the poll loop.
    "delta_stream_source" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val d = freshDir("gds")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      LakeWriter.updateWhere(s, d, "o_orderstatus = 'F'",
        Map("o_totalprice" -> "o_totalprice * 2"))
      LakeWriter.deleteWhere(s, d, "o_orderstatus = 'P'")
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 >= 8").repartition(2), d)
      val state = scala.collection.mutable.Map
        .empty[String, (java.math.BigDecimal, Long)]
      val q = s.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("maxVersionsPerTrigger", "2")
        .load(d)
        .writeStream
        .option("checkpointLocation", freshDir("gdscp"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1))
            .when(col("_change_type").isin("delete", "update_preimage"), lit(-1))
          b.select(col("o_orderstatus"),
              (sign * col("o_totalprice").cast("decimal(18,2)")).as("dv"),
              sign.cast("long").as("dc"))
            .groupBy("o_orderstatus")
            .agg(sum(col("dv")).cast("decimal(28,2)").as("ds"), sum(col("dc")).as("dcnt"))
            .collect().foreach { r =>
              val k = r.getString(0)
              val (s0, c0) = state.getOrElse(k, (java.math.BigDecimal.ZERO, 0L))
              state(k) = (s0.add(r.getDecimal(1)), c0 + r.getLong(2))
            }
          ()
        }
        .start()
      q.awaitTermination()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("view_sum",
          org.apache.spark.sql.types.DecimalType(28, 2)),
        org.apache.spark.sql.types.StructField("view_cnt",
          org.apache.spark.sql.types.LongType)))
      val rows = state.toSeq.filter(_._2._2 != 0L).sortBy(_._1).map {
        case (k, (sm, c)) => org.apache.spark.sql.Row(k, sm.setScale(2), c)
      }
      s.createDataFrame(new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
        .orderBy("o_orderstatus")
    }),

    // UTF-8 DATA SKIPPING end-to-end (r13): non-ASCII string bounds
    // prune readWhere and the answer still matches plain SQL. A
    // per-language marker prefix (CJK/accented) gives every file REAL
    // multi-byte stats after a range repartition on the string — the
    // predicate's code-point window [U+4E2D, U+4E2E) selects exactly
    // the zh-marked rows, and only the files whose truncated envelopes
    // may hold them open. Before r13 non-ASCII string columns got no
    // skipping at all (the biggest remaining pruning hole at 100 TB
    // for international corpora).
    "delta_utf8_skip" -> ((s, dir) => {
      val d = freshDir("u8")
      val marked = t(s, dir, "documents").select(
        col("source"), col("n_chars"),
        concat(expr(
          "CASE lang WHEN 'zh' THEN '中' WHEN 'es' THEN 'ñ' " +
            "WHEN 'de' THEN 'ß' WHEN 'fr' THEN 'é' ELSE 'a' END"),
          col("text")).as("s"))
      LakeWriter.writeDelta(marked.repartitionByRange(8, col("s")), d)
      DeltaReader.readWhere(s, d, "s >= '中' AND s < '丮'")
        .groupBy("source")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("source")
    }),

    "delta_cdf" -> ((s, dir) => {
      val d = freshDir("cdf")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      LakeWriter.updateWhere(s, d, "o_orderstatus = 'F'",
        Map("o_totalprice" -> "o_totalprice * 2"))
      DeltaReader.readChanges(s, d, 1L, 1L)
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"))
        .orderBy("change_type")
    }),

    // RESTORE: delete then restore to v0 — the latest snapshot must
    // reproduce the pre-delete state exactly, as a forward commit
    "delta_restore" -> ((s, dir) => {
      val d = freshDir("rst")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      LakeWriter.deleteWhere(s, d, "o_orderkey % 3 = 0")
      LakeWriter.restoreDelta(s, d, 0L)
      statusAgg(DeltaReader.read(s, d))
    }),

    // SHALLOW CLONE: fork the table, mutate the CLONE, read both —
    // the clone shows the post-delete state through absolute add.path
    // entries, the source must be bit-identically untouched
    "delta_clone" -> ((s, dir) => {
      val d = freshDir("cl")
      val d2 = freshDir("cl2")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      LakeWriter.cloneDelta(s, d, d2)
      LakeWriter.deleteWhere(s, d2, "o_orderkey % 3 = 0")
      statusAgg(DeltaReader.read(s, d2)).withColumn("side", lit("clone"))
        .unionByName(statusAgg(DeltaReader.read(s, d)).withColumn("side", lit("source")))
        .orderBy("side", "o_orderstatus")
    }),

    // CONVERT TO DELTA: plain parquet converted in place, then a
    // first-class append on the converted table
    "delta_convert" -> ((s, dir) => {
      val d = freshDir("cv")
      t(s, dir, "orders").where("o_orderkey % 10 < 3").repartition(2)
        .write.mode("append").parquet(d)
      LakeWriter.convertToDelta(s, d)
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 = 7").repartition(1), d)
      statusAgg(DeltaReader.read(s, d))
    }),

    // ALTER ADD COLUMNS + UPDATE into the new column: old rows
    // null-fill, updated rows carry the computed value
    // the none -> name column-mapping UPGRADE mid-life (r16): a plain
    // table upgrades METADATA-ONLY (old files keep resolving — their
    // names became the physical names), then the whole mapped surface
    // works on it: rename (metadata-only), schema EVOLUTION (fresh
    // field id above the stamped maxColumnId), and a CoW DELETE whose
    // rewrites stage under the physical names. r17 closes the loop:
    // the mapping is then REMOVED (name -> none, the full rewrite back
    // to logical footers) and the final read runs on the unmapped
    // table — values must be bit-identical through the round trip
    "delta_cm_upgrade" -> ((s, dir) => {
      val d = freshDir("cmup")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      LakeWriter.alterProperties(s, d, Map("delta.columnMapping.mode" -> "name"))
      LakeWriter.renameColumn(s, d, "o_totalprice", "price")
      LakeWriter.appendDeltaEvolve(
        t(s, dir, "orders").where("o_orderkey % 10 >= 6 AND o_orderkey % 10 < 8")
          .withColumnRenamed("o_totalprice", "price")
          .withColumn("score", expr("CAST(o_orderkey % 5 AS DOUBLE)"))
          .repartition(2), d)
      s.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 3 = 0")
      s.sql(s"ALTER TABLE graft_delta.`$d` SET TBLPROPERTIES " +
        "('delta.columnMapping.mode' = 'none')")
      DeltaReader.read(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("price"))).cast("decimal(18,2)").as("total"),
          sum(col("score")).cast("double").as("score_sum"))
        .orderBy("o_orderstatus")
    }),

    "delta_alter" -> ((s, dir) => {
      val d = freshDir("alt")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4), d)
      // driven through SQL (routes to alterAddColumns / updateWhere)
      s.sql(s"ALTER TABLE graft_delta.`$d` ADD COLUMNS (score DOUBLE)")
      s.sql(s"UPDATE graft_delta.`$d` SET score = CAST(o_orderkey % 5 AS DOUBLE) " +
        "WHERE o_orderkey % 2 = 0")
      DeltaReader.read(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"),
          sum(col("score")).cast("double").as("score_sum"))
        .orderBy("o_orderstatus")
    }),

    // time travel: v0 = even keys, v1 appends odd keys; versionAsOf 0
    // must reproduce exactly the even-key state
    // INSERT OVERWRITE (atomic truncate-and-load) then INSERT INTO
    // (append), both through the SQL DML surface on a CDF table — the
    // overwrite stages its table-sized complete change data in the
    // same commit; final state = overwrite slice + appended slice
    "delta_overwrite" -> ((s, dir) => {
      val d = freshDir("ovw")
      // table born through SQL CTAS (routes to writeDelta with the
      // declared properties), then mutated through SQL INSERTs
      t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(4)
        .createOrReplaceTempView("graft_ovw_base")
      s.sql(s"CREATE TABLE graft_delta.`$d` " +
        "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true') " +
        "AS SELECT * FROM graft_ovw_base")
      t(s, dir, "orders").where("o_orderkey % 10 >= 6 AND o_orderkey % 10 < 8")
        .createOrReplaceTempView("graft_ovw_src")
      s.sql(s"INSERT OVERWRITE graft_delta.`$d` SELECT * FROM graft_ovw_src")
      t(s, dir, "orders").where("o_orderkey % 10 >= 8")
        .createOrReplaceTempView("graft_ins_src")
      s.sql(s"INSERT INTO graft_delta.`$d` SELECT * FROM graft_ins_src")
      statusAgg(DeltaReader.read(s, d))
    }),

    "delta_time_travel" -> ((s, dir) => {
      val d = freshDir("tt")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 2 = 0").repartition(2), d)
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 2 = 1").repartition(2), d)
      statusAgg(DeltaReader.read(s, d, versionAsOf = Some(0L)))
    }),

    // TIMESTAMP_NTZ end-to-end: orders' NTZ o_orderdate round-trips
    // through a Delta table that must DECLARE the timestampNtz feature
    // (required loudly), and the wall-clock rendering of every value
    // must equal DuckDB's reading of the raw parquet — a UTC shift
    // anywhere in the write/stat/read path would move month buckets
    "delta_ntz" -> ((s, dir) => {
      val d = freshDir("ntz")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(3), d)
      val snap = DeltaReader.snapshot(s, d, None)
      require(snap.readerFeatures.contains("timestampNtz"),
        s"NTZ table must declare the feature, got ${snap.readerFeatures}")
      DeltaReader.read(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"))
        .orderBy("ym")
    }),

    // typed data skipping end-to-end: a time-range predicate on the
    // NTZ order date prunes files from the footer-derived bounds (the
    // require gates it — a stats regression reads every file and
    // fails loudly) and the pruned read recomputes exactly
    "delta_time_skip" -> ((s, dir) => {
      val d = freshDir("tsk")
      LakeWriter.writeDelta(
        t(s, dir, "orders").repartitionByRange(8, col("o_orderdate")), d)
      val snap = DeltaReader.snapshot(s, d, None)
      val pred = "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND " +
        "o_orderdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
      val prunedN = graft.sources.DeltaStats.prune(s, snap.active, pred, snap).size
      require(prunedN < snap.active.size,
        s"time-range skipping must drop files: kept $prunedN of ${snap.active.size}")
      DeltaReader.readWhere(s, d, pred)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"))
        .orderBy("ym")
    }),

    // generated-partition derivation end-to-end: p_year is GENERATED
    // AS year(o_orderdate) and is the partition column; a timestamp
    // predicate alone must prune partitions EVEN WITH per-file stats
    // STRIPPED (the foreign-add shape stats cannot help with) — the
    // require gates the derivation, and the pruned read recomputes
    // exactly against the oracle
    "delta_gen_prune" -> ((s, dir) => {
      val d = freshDir("gpn")
      val df = t(s, dir, "orders")
        .withColumn("p_year", expr("year(o_orderdate)"))
        .withMetadata("p_year", new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "year(o_orderdate)").build())
      LakeWriter.writeDelta(df, d, partitionBy = Seq("p_year"))
      val snap = DeltaReader.snapshot(s, d, None)
      val statless = snap.active.map(_.copy(stats = None))
      val pred = "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND " +
        "o_orderdate <= TIMESTAMP_NTZ'1996-12-31 23:59:59'"
      val kept = graft.sources.DeltaStats.prune(s, statless, pred, snap)
      require(kept.size < statless.size &&
        kept.forall(_.partitionValues("p_year") == "1996"),
        s"generated-partition derivation must prune stats-less files to the " +
          s"1996 partition: kept ${kept.map(_.partitionValues("p_year")).distinct}")
      DeltaReader.readWhere(s, d, pred)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("decimal(18,2)").as("total"))
        .orderBy("ym")
    }),

    // operationMetrics end-to-end: the funnel's metering must agree
    // with the data — summed numOutputRows across the two write
    // commits equals the recomputed row count, file counts positive
    "delta_metrics" -> ((s, dir) => {
      import s.implicits._
      val d = freshDir("met")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 3").repartition(2), d)
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 >= 3 AND o_orderkey % 10 < 6")
          .repartition(2), d)
      val m = DeltaReader.history(s, d)
        .select(col("version"), col("operationMetrics"))
        .as[(Long, Map[String, String])].collect().toMap
      require(m.keySet == Set(0L, 1L), s"expected versions 0,1: ${m.keySet}")
      m.values.foreach(mm => require(mm("numAddedFiles").toLong > 0 &&
        mm("numAddedBytes").toLong > 0, s"unmetered commit: $mm"))
      val metered = m.values.map(_("numOutputRows").toLong).sum
      Seq((2L, metered)).toDF("commits", "metered_rows")
    }),

    // expired-log cleanup end-to-end: 5 versions, checkpoint at 2,
    // versions 0-1 aged past retention — cleanup must delete exactly
    // those two commit jsons (required loudly), history starts at the
    // boundary, and the table's DATA is untouched by the metadata
    // cleanup (the aggregate equals the plain recompute)
    "delta_logclean" -> ((s, dir) => {
      import s.implicits._
      val d = freshDir("lc")
      val src = t(s, dir, "orders").where("o_orderkey % 10 < 6")
      LakeWriter.writeDelta(src.where("o_orderkey % 5 = 0").repartition(2), d)
      (1 to 4).foreach(k =>
        LakeWriter.appendDelta(src.where(s"o_orderkey % 5 = $k").repartition(2), d))
      LakeWriter.checkpointDelta(s, d, 2L)
      val log = new org.apache.hadoop.fs.Path(d, "_delta_log")
      val fs = log.getFileSystem(s.sessionState.newHadoopConf())
      (0L to 1L).foreach { v =>
        fs.setTimes(new org.apache.hadoop.fs.Path(log, f"$v%020d.json"),
          System.currentTimeMillis() - 40L * 86400000L, -1)
      }
      val deleted = LakeWriter.cleanExpiredLogs(s, d)
      require(deleted == (0L to 1L).flatMap(v =>
          Seq(f"$v%020d.crc", f"$v%020d.json")),
        s"cleanup must delete exactly the aged prefix (commits + their " +
          s"version checksums), got $deleted")
      val hv = DeltaReader.history(s, d).select($"version").as[Long].collect().toSet
      require(hv == Set(2L, 3L, 4L), s"history must start at the boundary: $hv")
      statusAgg(DeltaReader.read(s, d))
    }),

    // version checksums end-to-end: a mutation chain folds the .crc
    // incrementally; every retained version validates against its
    // replay (a lost-commit fingerprint would throw here), and the
    // final state recomputes exactly in the oracle
    "delta_checksum" -> ((s, dir) => {
      val d = freshDir("crc")
      LakeWriter.writeDelta(
        t(s, dir, "orders").where("o_orderkey % 10 < 6").repartition(3), d)
      LakeWriter.deleteWhere(s, d, "o_orderkey % 3 = 0")
      LakeWriter.appendDelta(
        t(s, dir, "orders").where("o_orderkey % 10 >= 6 AND o_orderkey % 10 < 8")
          .repartition(2), d)
      LakeWriter.compactDelta(s, d, minFiles = 2)
      val latest = DeltaReader.snapshot(s, d, None).version
      (0L to latest).foreach { v =>
        require(DeltaReader.validateChecksum(s, d, Some(v)),
          s"version $v must carry a valid checksum")
      }
      statusAgg(DeltaReader.read(s, d))
    })
  )

  def oracles: Map[String, String] = Map(
    "delta_ntz" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS cnt,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |FROM orders WHERE o_orderkey % 10 < 6
        |GROUP BY ym ORDER BY ym""".stripMargin,

    "delta_time_skip" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS cnt,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY ym ORDER BY ym""".stripMargin,

    "delta_gen_prune" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS cnt,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY ym ORDER BY ym""".stripMargin,

    "delta_metrics" ->
      """SELECT CAST(2 AS BIGINT) AS commits, CAST(COUNT(*) AS BIGINT) AS metered_rows
        |FROM orders WHERE o_orderkey % 10 < 6""".stripMargin,

    "delta_logclean" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_checksum" ->
      s"""$aggSql
         |FROM orders
         |WHERE (o_orderkey % 10 < 6 AND NOT (o_orderkey % 3 = 0))
         |   OR (o_orderkey % 10 >= 6 AND o_orderkey % 10 < 8)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_catalog" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
         |                    ELSE o_totalprice END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
         |FROM orders WHERE o_orderkey % 10 < 6 AND NOT (o_orderkey % 3 = 2)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_delete" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6 AND NOT (o_orderkey % 3 = 0)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_dv_delete" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6 AND NOT (o_orderkey % 3 = 1)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_update" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
         |                    ELSE o_totalprice END AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
         |FROM orders WHERE o_orderkey % 10 < 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_merge" ->
      s"""WITH t AS (SELECT * FROM orders WHERE o_orderkey % 10 < 6),
         | s AS (SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
         |              o_totalprice * 3 AS o_totalprice, o_orderdate, o_orderpriority
         |       FROM orders WHERE o_orderkey % 10 >= 4 AND o_orderkey % 10 < 8),
         | m AS (SELECT * FROM s
         |       UNION ALL
         |       SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s))
         |$aggSql
         |FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_overwrite" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 >= 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_replicate" ->
      s"""WITH t1 AS (SELECT * FROM orders
         |            WHERE o_orderkey % 10 < 6 AND NOT (o_orderkey % 3 = 0)),
         | t2 AS (SELECT o_orderstatus,
         |               CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
         |                    ELSE o_totalprice END AS o_totalprice
         |        FROM t1),
         | fin AS (SELECT * FROM t2
         |         UNION ALL
         |         SELECT o_orderstatus, o_totalprice FROM orders
         |         WHERE o_orderkey % 10 >= 6 AND o_orderkey % 10 < 8)
         |$aggSql
         |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_merge_cdc" ->
      s"""WITH t AS (SELECT * FROM orders WHERE o_orderkey % 10 < 6),
         | s AS (SELECT *, CASE WHEN o_orderkey % 3 = 0 THEN 'D'
         |                     WHEN o_orderkey % 2 = 0 THEN 'U' ELSE 'I' END AS op
         |       FROM orders WHERE o_orderkey % 4 = 1),
         | m AS (SELECT t.o_orderkey, t.o_orderstatus,
         |              CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice * 2
         |                   ELSE t.o_totalprice END AS o_totalprice,
         |              COALESCE(s.op = 'D', FALSE) AS del
         |       FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey),
         | res AS (SELECT o_orderstatus, o_totalprice FROM m WHERE NOT del
         |         UNION ALL
         |         SELECT o_orderstatus, o_totalprice FROM s
         |         WHERE op <> 'D' AND o_orderkey NOT IN (SELECT o_orderkey FROM t))
         |$aggSql
         |FROM res GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_zorder" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_variant" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
         |FROM orders WHERE o_orderkey % 10 < 5 AND o_orderkey % 7 <> 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_widen" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
         |FROM orders WHERE o_orderkey % 10 < 7
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_reorg" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6
         | AND o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_cluster" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 7
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_sizing" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_maintenance" ->
      s"""$aggSql
         |FROM orders WHERE (o_orderkey % 10 < 6 AND o_orderkey % 7 <> 0)
         |   OR o_orderkey % 10 >= 8
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_evolve" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
         | COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS bucket_cnt,
         | CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey % 4 END) AS BIGINT) AS bucket_sum
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_row_tracking" ->
      s"""WITH a AS (SELECT COUNT(*) AS n0 FROM orders WHERE o_orderkey % 10 < 6),
         | s AS (SELECT COUNT(*) AS ns FROM orders
         |       WHERE o_orderkey % 10 < 6 AND o_orderkey % 7 <> 0),
         | b AS (SELECT COUNT(*) AS nb FROM orders WHERE o_orderkey % 10 >= 8)
         |SELECT s.ns + b.nb AS n_rows, s.ns + b.nb AS n_ids,
         |  a.n0 + b.nb - 1 AS max_id, CAST(2 AS BIGINT) AS n_versions
         |FROM a, s, b""".stripMargin,

    "delta_ivm" ->
      s"""WITH upd AS (SELECT o_orderstatus,
         |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
         |         ELSE o_totalprice END AS p
         |  FROM orders WHERE o_orderkey % 10 < 6),
         | del AS (SELECT * FROM upd WHERE o_orderstatus <> 'P'),
         | fin AS (SELECT * FROM del UNION ALL
         |   SELECT o_orderstatus, o_totalprice AS p FROM orders
         |   WHERE o_orderkey % 10 >= 8)
         |SELECT o_orderstatus,
         | CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS view_sum,
         | COUNT(*) AS view_cnt
         |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // same final state as delta_ivm: streamed-CDF folding must equal
    // the from-scratch aggregate
    "delta_stream_source" ->
      s"""WITH upd AS (SELECT o_orderstatus,
         |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
         |         ELSE o_totalprice END AS p
         |  FROM orders WHERE o_orderkey % 10 < 6),
         | del AS (SELECT * FROM upd WHERE o_orderstatus <> 'P'),
         | fin AS (SELECT * FROM del UNION ALL
         |   SELECT o_orderstatus, o_totalprice AS p FROM orders
         |   WHERE o_orderkey % 10 >= 8)
         |SELECT o_orderstatus,
         | CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS view_sum,
         | COUNT(*) AS view_cnt
         |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the marker CASE makes `s >= '中' AND s < '丮'` ≡ lang = 'zh'
    // (every other marker and bare text sits below U+4E2D in binary
    // UTF-8 order, which both engines compare strings in)
    "delta_utf8_skip" ->
      s"""SELECT source, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS chars
         |FROM documents WHERE lang = 'zh'
         |GROUP BY source ORDER BY source""".stripMargin,

    "delta_cdf" ->
      s"""WITH base AS (SELECT * FROM orders
         |              WHERE o_orderkey % 10 < 6 AND o_orderstatus = 'F'),
         | ch AS (SELECT 'update_preimage' AS change_type, o_totalprice FROM base
         |        UNION ALL
         |        SELECT 'update_postimage' AS change_type, o_totalprice * 2 FROM base)
         |SELECT change_type, COUNT(*) AS cnt,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
         |FROM ch GROUP BY change_type ORDER BY change_type""".stripMargin,

    "delta_restore" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_time_travel" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 2 = 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_clone" ->
      s"""WITH base AS (SELECT * FROM orders WHERE o_orderkey % 10 < 6),
         | pair AS (
         |   SELECT 'clone' AS side, o_orderstatus, o_totalprice FROM base
         |   WHERE NOT (o_orderkey % 3 = 0)
         |   UNION ALL
         |   SELECT 'source' AS side, o_orderstatus, o_totalprice FROM base)
         |SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
         | side
         |FROM pair GROUP BY side, o_orderstatus ORDER BY side, o_orderstatus""".stripMargin,

    "delta_convert" ->
      s"""$aggSql
         |FROM orders WHERE o_orderkey % 10 < 3 OR o_orderkey % 10 = 7
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_cm_upgrade" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
         | CAST(SUM(CASE WHEN o_orderkey % 10 >= 6 THEN CAST(o_orderkey % 5 AS DOUBLE) END) AS DOUBLE) AS score_sum
         |FROM orders WHERE o_orderkey % 10 < 8 AND o_orderkey % 3 <> 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "delta_alter" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
         | CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey % 5 AS DOUBLE) END) AS DOUBLE) AS score_sum
         |FROM orders WHERE o_orderkey % 10 < 6
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
