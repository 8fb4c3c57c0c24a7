package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only phase profiler: times the sub-stages of the heaviest bench
  * queries so optimization targets the measured cost, not a guess.
  * Not part of the driver contract.
  */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = GraftSession.tuneLocal(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    // ad-hoc experiment overrides: GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.range(0, 1000000L, 1, 8).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").count().orderBy(desc("count")).limit(5).count()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val which = if (args.isEmpty) "cocoa_topk" else args(0)
    which match {
      case "cocoa_topk" => cocoaTopk(spark, sfDir)
      case "jaccard"    => jaccard(spark, sfDir)
      case "clusters"   => clusters(spark, sfDir)
      case "index"      => index(spark, sfDir)
      case "corr"       => corr(spark, sfDir)
      case "dup_tables" => dupTables(spark, sfDir)
      case "explain"    => explainPlans(spark, sfDir)
      case "jobs"       => jobProfile(spark, sfDir, args.lift(1).getOrElse("cocoa_topk_features"))
      case "jobsq"      => jobProfileNoWarm(spark, sfDir, args.lift(1).getOrElse("delta_merge"))
      case "delta-phases" => deltaPhases(spark, sfDir)
      case "write-phases" => writePhases(spark, sfDir)
      case "warm-components" => warmComponents(spark, sfDir)
      case "pipeline-phases" => pipelinePhases(spark, sfDir)
      case "explainq" =>
        args.lift(1).getOrElse("q5_multijoin").split(',').foreach { q =>
          println(s"==== $q ====")
          SparkEntry.queries(q)(spark, sfDir).explain("formatted")
        }
      case "stress"     => stress(spark, args.lift(1).map(_.toInt).getOrElse(200000))
      case "stress-tables" => stressTables(spark, args.lift(1).map(_.toInt).getOrElse(1000))
      case "stress-merged" => stressMerged(spark, args.lift(1).map(_.toInt).getOrElse(1000))
      case "stress-merged-rows" =>
        stressMergedRows(spark, args.lift(1).map(_.toInt).getOrElse(2000000))
      case "stress-delta" => stressDelta(spark, args.lift(1).map(_.toInt).getOrElse(10000))
      case "stress-delta-mutate" =>
        stressDeltaMutate(spark, args.lift(1).map(_.toInt).getOrElse(2000))
      case "stress-dv-scatter" =>
        stressDvScatter(spark, args.lift(1).map(_.toInt).getOrElse(2000))
      case "stress-vacuum" =>
        stressVacuum(spark, args.lift(1).map(_.toInt).getOrElse(100000))
      case "stress-snapshot-cache" =>
        stressSnapshotCache(spark, args.lift(1).map(_.toInt).getOrElse(40))
      case "stress-history-memo" =>
        stressHistoryMemo(spark, args.lift(1).map(_.toInt).getOrElse(300))
      case "stress-cluster" =>
        stressCluster(spark, args.lift(1).map(_.toInt).getOrElse(2000000))
      case "stress-cm-remove" =>
        stressCmRemove(spark, args.lift(1).map(_.toInt).getOrElse(2000000))
      case "stress-cm-optimize" =>
        stressCmOptimize(spark, args.lift(1).map(_.toInt).getOrElse(2000000))
      case "stress-delta-files" =>
        stressDeltaFiles(spark, args.lift(1).map(_.toInt).getOrElse(200000))
      case "stress-delta-clone" =>
        stressDeltaClone(spark, args.lift(1).map(_.toInt).getOrElse(200000))
      case "stress-convert" =>
        stressConvert(spark, args.lift(1).map(_.toInt).getOrElse(2000))
      case "stress-logclean" =>
        stressLogClean(spark, args.lift(1).map(_.toInt).getOrElse(20000))
      case "recall"     => annRecall(spark, sfDir)
      case "stress-graph" =>
        stressGraph(spark, args.lift(1).map(_.toInt).getOrElse(2000000))
      case "stress-topk" =>
        stressTopk(spark, args.lift(1).map(_.toInt).getOrElse(5000000))
      case "stress-funnel" =>
        stressFunnel(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case "stress-stream" =>
        stressStream(spark, args.lift(1).map(_.toInt).getOrElse(50))
      case q            =>
        time(s"${q}_pass1")(SparkEntry.queries(q)(spark, sfDir).count())
        time(s"${q}_pass2")(SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }

  def index(spark: SparkSession, dir: String): Unit = {
    import graft.index.{LakeIndexer, TestLake}
    import graft.functions.TextFunctions
    val tables = TestLake.tables(spark, dir)
    time("scan_only")(tables.map(_.df.count()).sum)
    val melt = tables.map { tb =>
      tb.df.select(tb.rowId.cast("long").as("rowid"),
        posexplode(array(tb.cols.map(c => col(c).cast("string")): _*)).as(Seq("colid", "tok")))
    }.reduce(_ unionByName _)
    time("melt_only")(melt.count())
    val meltClean = tables.map { tb =>
      tb.df.select(tb.rowId.cast("long").as("rowid"),
        posexplode(array(tb.cols.map(c =>
          TextFunctions.cleanedText(coalesce(col(c).cast("string"), lit("")))): _*)).as(Seq("colid", "tok")))
    }.reduce(_ unionByName _)
    time("melt_clean")(meltClean.count())
    val nocache = LakeIndexer.cells(tables)
    time("cells_nocache")(nocache.count())
    time("cells_nocache2")(nocache.count())
    time("cells_cached")(graft.index.TestLake.cells(spark, dir).count())
    time("cellsBloom")(graft.index.TestLake.cellsBloom(spark, dir).count())
    time("cells_again")(graft.index.TestLake.cells(spark, dir).count())
  }

  def corr(spark: SparkSession, dir: String): Unit = {
    import graft.cocoa.Cocoa
    import graft.mate.Mate
    import graft.index.CocoaIndex
    val cells = graft.index.TestLake.cells(spark, dir)
    time("cells_count")(cells.count())
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val (top, jm0) = Mate.searchAndMaps(cust, col("c_custkey"), Seq("c_nationkey"), cells, 5)
    time("searchAndMaps")(jm0.count())
    val jm = jm0.select(col("tableid"), col("rowid").as("ext_row"), col("input_row"))
    val excluded = top.select(col("tableid"), col("columns").cast("int").as("colid"))
    val input = cust.select(col("c_custkey").as("input_row"), col("c_acctbal").as("target"))
    val inputRanked = Cocoa.targetRanks(input)
    time("pairs_count")(jm.count())
    val candTables = jm.select("tableid").distinct()
    val sorted = CocoaIndex.withSortValue(
      cells.join(broadcast(candTables), Seq("tableid"), "left_semi")
        .join(excluded, Seq("tableid", "colid"), "left_anti"))
    time("sorted_count")(sorted.count())
    val perRow = sorted
      .join(jm.withColumnRenamed("ext_row", "rowid"), Seq("tableid", "rowid"))
      .groupBy(col("table_col_id"), col("tableid"), col("input_row"))
      .agg(max(col("vnum")).as("vnum"), max(col("tokenized")).as("v_str"),
        first(col("is_numeric")).as("is_numeric"))
    time("perRow_count")(perRow.count())
    val ord = org.apache.spark.sql.expressions.Window.partitionBy("table_col_id")
      .orderBy(col("vnum").asc_nulls_last, col("v_str").asc, col("input_row").asc)
    val valKey = when(col("is_numeric"), coalesce(col("vnum").cast("string"), lit(" nan")))
      .otherwise(col("v_str"))
    val ranked = perRow
      .withColumn("rn", row_number().over(ord))
      .withColumn("vk", valKey)
      .withColumn("xr", avg(col("rn")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("table_col_id"), col("vk"))))
      .join(inputRanked, "input_row")
    time("ranked_count")(ranked.count())
    val g = ranked
      .groupBy(col("tableid"), col("table_col_id"), col("is_numeric"), col("xr"))
      .agg(count(lit(1)).cast("double").as("qty"), sum(col("rt")).as("s"))
    time("g_count")(g.count())
    val full = Cocoa.correlations(inputRanked, jm, cells, excluded)
    time("correlations_full")(full.count())
  }

  def cocoaTopk(spark: SparkSession, dir: String): Unit = {
    import graft.cocoa.Cocoa
    import graft.mate.Mate
    val cells = time("cells_build")(graft.index.TestLake.cells(spark, dir))
    time("cells_count")(cells.count())
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val (top, jm0) = Mate.searchAndMaps(cust, col("c_custkey"), Seq("c_nationkey"), cells, 5)
    time("searchAndMaps_top")(top.count())
    time("searchAndMaps_maps")(jm0.count())
    val jm = jm0.select(col("tableid"), col("rowid").as("ext_row"), col("input_row"))
    val excluded = top.select(col("tableid"), col("columns").cast("int").as("colid"))
    val input = cust.select(col("c_custkey").as("input_row"), col("c_acctbal").as("target"))
    val ranked = time("targetRanks")(Cocoa.targetRanks(input))
    time("targetRanks_count")(ranked.count())
    val corr = Cocoa.correlations(ranked, jm, cells, excluded)
    time("correlations_count")(corr.count())
    time("full_query_again")(SparkEntry.queries("cocoa_topk_features")(spark, dir).count())
  }

  def jaccard(spark: SparkSession, dir: String): Unit = {
    import graft.dedup.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val inv = docs
      .select(col("doc_id").cast("long").as("did"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("did"), size(col("sh")).as("sz"), explode(col("sh")).as("g"))
    time("inv_count")(inv.count())
    val pairs = Dedup.ngramJaccardPairs(docs)
    time("pairs_count")(pairs.count())
    time("tau_filter")(Dedup.ngramJaccard(docs, 0.5).count())
    time("again")(Dedup.ngramJaccard(docs, 0.5).count())
  }

  def clusters(spark: SparkSession, dir: String): Unit = {
    import graft.dedup.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = Dedup.ngramJaccard(docs, 0.5)
    time("pairs")(pairs.count())
    time("clusters_total")(Dedup.clusters(docs, pairs).count())
  }

  /** Synthetic corpus stress: nDocs documents (~40 words each, 10%
    * exact dups, clustered near-dups) through the dedup family — the
    * empirical check that the operators hold far beyond the driver
    * testdata sizes, not just at sf0.1.
    */
  def stress(spark: SparkSession, nDocs: Int): Unit = {
    import graft.dedup.Dedup
    val docs = spark.range(0, nDocs, 1, 32).selectExpr(
      "id AS doc_id",
      // 90% unique body, 10% repeat of an earlier doc's body; each body
      // ~40 words over a ~50k-word vocabulary with shared phrases
      """concat_ws(' ',
           transform(sequence(0, 39),
             i -> concat('w', pmod(hash(CASE WHEN id % 10 = 9 THEN id - 5 ELSE id END, i), 50000)))
         ) AS text""")
      .cache()
    time(s"materialize_${nDocs}_docs")(docs.count())
    time("exact_dedup")(docs.select(org.apache.spark.sql.functions.md5(col("text"))).distinct().count())
    time("minhash_lsh")(Dedup.minhashLsh(docs, 0.5).count())
    val pairs = Dedup.ngramJaccard(docs, 0.5).cache()
    time("jaccard_pairs")(pairs.count())
    time("clusters_local")(Dedup.clusters(docs, pairs).count())
    time("clusters_distributed")(Dedup.clusters(docs, pairs, localThreshold = 0).count())
    time("boilerplate")(graft.text.TextAnalysis.boilerplateShare(docs, 3, 50).count())
    val spans = Dedup.duplicateSpans(docs, 5, 8).cache()
    time("duplicate_spans")(spans.count())
    time("remove_spans")(Dedup.removeSpans(docs, spans).count())
    spans.unpersist()
    // ~50k-word vocabulary at ~160 occurrences each: capacity must
    // exceed the distinct count for a sub-threshold error bound
    time("heavy_hitters")(
      graft.ops.HeavyHitters.frequentTokens(docs, 150L, maxMapSize = 1 << 17).count())
    val bpeMerges = time("bpe_train_64")(
      graft.text.Bpe.train(graft.text.Bpe.wordCounts(docs), 64))
    time("bpe_encode")(graft.text.Bpe.encode(spark, docs, bpeMerges).count())
    time("cdc_chunks")(graft.text.TextAnalysis.cdcChunks(spark, docs).count())
    // synthetic embeddings riding the same ids: 64-dim signed hash
    // noise (cross-doc cos ≈ 0), with 10% of vectors exact copies of an
    // earlier one — near-dups are SPARSE, as in a real corpus; a
    // generator where whole cells sit above τ would make Σ cell² the
    // whole n² and no semantic-dedup design survives that input
    val emb = spark.range(0, nDocs, 1, 32).selectExpr(
      "id AS vec_id",
      """transform(sequence(0, 63),
           i -> cast(cast(pmod(hash(CASE WHEN id % 10 = 9 THEN id - 5 ELSE id END, i), 2001) - 1000 AS double) / 1000.0
             AS float)) AS embedding""")
      .cache()
    time(s"materialize_${nDocs}_embeddings")(emb.count())
    // nCells scales with the corpus (SemDeDup runs ~100k cells on
    // LAION): bound mean cell size so within-cell pair work stays flat
    time("semantic_dedup")(
      Dedup.semantic(emb, 0.92, nCells = 256, maxIter = 3, maxTrain = 20000).count())
    // nCells scales with the corpus here too: probed candidates per
    // query are nProbe/nCells of the corpus, and the candidate shuffle
    // is THE cost — 16 cells would ship 50M candidate rows for this
    // batch (measured 41s), 64 cells ships 12.5M
    time("ivfpq_knn_1k_queries")(
      graft.sim.Similarity.ivfPqKnn(emb.where(col("vec_id") < 1000), emb, 3,
        nCells = 64, maxTrain = 20000, maxIter = 5).count())
    time("diversity_sample")(
      graft.sim.Similarity.diversitySample(emb, 50,
        nCells = 256, maxTrain = 20000, maxIter = 3).count())
    // persisted ANN index: offline build + search from disk with
    // probed-cell partition pruning
    val annDir = java.nio.file.Files.createTempDirectory("annstress").toString
    val pqModel = time("ann_index_train")(
      graft.sim.Similarity.trainPq(emb, nCells = 64, m = 8, bits = 4,
        maxTrain = 20000, maxIter = 5))
    time("ann_index_persist")(
      graft.sim.Similarity.writeAnnIndex(annDir, pqModel,
        graft.sim.Similarity.encodePq(emb, pqModel)))
    val (annM, annCodes) = graft.sim.Similarity.readAnnIndex(spark, annDir)
    time("ann_search_persisted_1k")(
      graft.sim.Similarity.ivfPqSearch(emb.where(col("vec_id") < 1000), annCodes, annM, 3).count())
    emb.unpersist()
    docs.unpersist()
  }

  /** Wide-lake PLANNING stress: nTables small tables through the
    * index build. The executor work is trivial by construction — what
    * this measures is the driver (analyzer/optimizer) walking a
    * union of nTables branches, the cost that dominates first build on
    * a 10^4-10^5-table lake and that `balancedUnion` bounds. Phases
    * are timed separately so a planning blowup is visible as such.
    */
  def stressTables(spark: SparkSession, nTables: Int): Unit = {
    import graft.index.{LakeIndexer, LakeTable}
    val tables = time(s"define_${nTables}_tables")((1 to nTables).map { i =>
      val df = spark.range(0, 20, 1, 1).selectExpr(
        "id AS __rid", "cast(id AS string) AS k",
        s"concat('t$i-', id) AS name", s"cast(id * $i AS string) AS v")
      LakeTable(i, s"t$i", df, col("__rid"), Seq("k", "name", "v"))
    })
    val cells = LakeIndexer.cells(tables)
    time("cells_analyze")(cells.queryExecution.analyzed)
    time("cells_optimize")(cells.queryExecution.executedPlan)
    time("cells_count")(cells.count())
    time("cells_count2")(cells.count())
    val info = LakeIndexer.tableInfo(tables)
    time("table_info_analyze")(info.queryExecution.analyzed)
    time("table_info_count")(info.count())
  }

  /** The same wide lake as [[stressTables]], but on disk and ingested
    * through the MERGED path (readFolderMerged + cellsMerged): all
    * nTables csv files are one scan branch and one codegen unit, so
    * plan width is O(groups), not O(tables) — the comparison number
    * that justifies the merged entry point.
    */
  /** Delta log path at streaming-debt scale: n single-add commits
    * (what a micro-batch sink leaves), snapshot/lastTxnVersion replay
    * cost with NO checkpoint vs replaying from one at n-101 (interval
    * ≈ 100) and one at n-1 — proves the driver-side component is
    * bounded by checkpointInterval in practice, not just by design.
    */
  /** Mutation-family stress at FILE-COUNT scale: a `files`-file table
    * (tight per-file id ranges via repartitionByRange) takes a narrow
    * copy-on-write delete, a narrow DV delete and a 10-key merge —
    * each must touch O(matching files), not the table — plus a
    * change-feed catch-up cost curve (cdc commits hand-authored over
    * one shared cdc parquet, so the measurement isolates the
    * per-version driver parse + plan cost, the thing that grows with
    * consumer lag).
    */
  /** Broad scattered merge-on-read delete: `files` files × 5000 rows,
    * DV-delete every other row (so EVERY file is affected and the
    * total bitmap volume is ∝ half the table). The point under test
    * is the r10 verdict's weak grade: sidecar authorship must stay on
    * the executors — driver heap must NOT grow with deleted-row
    * count, only with O(files) descriptors. Prints driver heap before
    * and after (post-GC) plus the commit wall time; the survivors
    * count and a spot predicate verify the delete's correctness.
    */
  /** Incremental clustering economics: a big clustered base (one FULL
    * layout), then a SMALL append + OPTIMIZE — the incremental pass
    * must scan/rewrite only the appended files, so its wall time
    * tracks the append size, not the base size (the nightly-OPTIMIZE
    * cost model of a 100-TB clustered table). Prints both times and
    * the rewritten-file counts; fails if the incremental pass touched
    * any base cube file.
    */
  def stressCluster(spark: SparkSession, baseRows: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_cluster_").toFile
    LakeWriter.writeDelta(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))),
      dir.getPath)
    LakeWriter.clusterBy(spark, dir.getPath, Seq("k", "v"))
    LakeWriter.appendDelta(spark.range(baseRows)
      .select(col("id").as("k"), (lit(baseRows.toLong) - col("id")).as("v"))
      .repartition(16), dir.getPath)
    time(s"full_layout_${baseRows}_rows") {
      LakeWriter.compactDeltaCluster(spark, dir.getPath, Seq("k", "v"),
        filesPerPartition = 16, full = true)
    }
    val base = DeltaReader.snapshot(spark, dir.getPath, None).active.map(_.path).toSet
    val appendRows = math.max(baseRows / 100, 1000)
    LakeWriter.appendDelta(spark.range(baseRows, baseRows + appendRows)
      .select(col("id").as("k"), (lit(baseRows.toLong) - col("id")).as("v"))
      .repartition(4), dir.getPath)
    time(s"incremental_optimize_${appendRows}_new_rows") {
      LakeWriter.compactDeltaCluster(spark, dir.getPath, Seq("k", "v"),
        filesPerPartition = 4)
    }
    val after = DeltaReader.snapshot(spark, dir.getPath, None).active
    require(base.subsetOf(after.map(_.path).toSet),
      "incremental OPTIMIZE rewrote a base cube file")
    println(s"  base cubes untouched: ${base.size} file(s); incremental cube: " +
      s"${after.count(a => !base.contains(a.path))} file(s)")
    val cnt = DeltaReader.read(spark, dir.getPath).count()
    require(cnt == baseRows.toLong + appendRows, s"row drift: $cnt")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  /** r16: the column-mapping staging cost at OPTIMIZE time — the same
    * bin-packed compaction and z-order rewrite on a MAPPED table vs an
    * identical UNMAPPED one. stagePhysicalRows is a metadata-only
    * projection (top-level aliases + positional casts carrying field
    * ids), so the mapped rewrites must price inside the unmapped band;
    * a real gap here would mean the staging added a shuffle or broke
    * codegen.
    */
  def stressCmOptimize(spark: SparkSession, rows: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    def mk(mapped: Boolean): String = {
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft_stress_cmopt_${mapped}_").toFile.getPath
      def slice(lo: Long, hi: Long) = spark.range(lo, hi).select(col("id"),
        concat(lit("v"), col("id")).as("v"), (col("id") % 97).as("k"))
      if (mapped) LakeWriter.writeDeltaMapped(slice(0, rows).repartition(4), dir)
      else LakeWriter.writeDelta(slice(0, rows).repartition(4), dir)
      // 16 tiny appends = the small-file debt OPTIMIZE folds
      (0 until 16).foreach { i =>
        LakeWriter.appendDelta(
          slice(rows + i * 1000L, rows + (i + 1) * 1000L).coalesce(1), dir)
      }
      dir
    }
    val plain = mk(false); val mapped = mk(true)
    time(s"optimize_unmapped_${rows}_rows_20_files") {
      LakeWriter.compactDelta(spark, plain, minFiles = 2)
    }
    time(s"optimize_mapped_${rows}_rows_20_files") {
      LakeWriter.compactDelta(spark, mapped, minFiles = 2)
    }
    time("zorder_unmapped") {
      LakeWriter.compactDeltaZOrder(spark, plain, "id", "k", filesPerPartition = 4)
    }
    time("zorder_mapped") {
      LakeWriter.compactDeltaZOrder(spark, mapped, "id", "k", filesPerPartition = 4)
    }
    val a = DeltaReader.read(spark, plain).count()
    val b = DeltaReader.read(spark, mapped).count()
    require(a == b && a == rows.toLong + 16000L, s"row drift: $a vs $b")
    Seq(plain, mapped).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  /** removeColumnMapping's price vs the equal-bytes comparator: a FULL
    * OPTIMIZE rewrite of the same mapped table (both move every byte
    * exactly once, bin-packed per partition, zero shuffles). Proves
    * the removal is compaction-priced — the claim SURVEY §4 makes for
    * scheduling it like a maintenance campaign at 100 TB.
    */
  def stressCmRemove(spark: SparkSession, rows: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    def mk(): String = {
      val dir = java.nio.file.Files.createTempDirectory(
        "graft_stress_cmrm_").toFile.getPath
      LakeWriter.writeDeltaMapped(spark.range(0, rows).select(col("id"),
        concat(lit("v"), col("id")).as("v"),
        (col("id") % 4).cast("string").as("k")).repartition(8), dir,
        partitionBy = Seq("k"))
      dir
    }
    val a = mk(); val b = mk()
    time(s"optimize_full_mapped_${rows}_rows") {
      LakeWriter.compactDelta(spark, a, minFiles = 1)
    }
    time(s"cm_remove_${rows}_rows") {
      LakeWriter.removeColumnMapping(spark, b)
    }
    val ca = DeltaReader.read(spark, a).count()
    val cb = DeltaReader.read(spark, b).count()
    require(ca == rows.toLong && cb == rows.toLong, s"row drift: $ca / $cb")
    require(!DeltaReader.snapshot(spark, b, None).configuration
      .contains("delta.columnMapping.mode"), "removal did not land")
    Seq(a, b).foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
  }

  /** The snapshot cache's per-query win: a session analyzing N queries
    * against one table pays the log replay (commit-suffix JSON parse +
    * checkpoint DataFrame setup) once, not N times. Measures 100 plan
    * constructions with the cache on vs off against a table with a
    * checkpoint base and a `commits`-deep suffix.
    */
  def stressSnapshotCache(spark: SparkSession, commits: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_snapcache_").toFile
    LakeWriter.writeDelta(spark.range(0, 10000)
      .select(col("id"), (col("id") % 7).as("m")).coalesce(2), dir.getPath)
    LakeWriter.checkpointDelta(spark, dir.getPath, 0L)
    (1 to commits).foreach { k =>
      LakeWriter.appendDelta(spark.range(k * 10000L, k * 10000L + 100)
        .select(col("id"), (col("id") % 7).as("m")).coalesce(1), dir.getPath)
    }
    def plans(n: Int): Unit =
      (1 to n).foreach(_ => DeltaReader.read(spark, dir.getPath).queryExecution.analyzed)
    plans(3) // warm both paths' class loading
    val r0 = DeltaReader.replayCounter.get()
    time(s"100_plan_builds_cache_on_${commits}_commit_suffix") { plans(100) }
    val hits = 100 - (DeltaReader.replayCounter.get() - r0)
    spark.conf.set("spark.graft.delta.snapshotCache.enabled", "false")
    try time(s"100_plan_builds_cache_off_${commits}_commit_suffix") { plans(100) }
    finally spark.conf.unset("spark.graft.delta.snapshotCache.enabled")
    println(s"  cache served $hits/100 snapshot resolutions without a replay")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  /** The commit-parse memo's effect on the history family: DESCRIBE
    * HISTORY and CDF plan builds over an N-commit retained log,
    * repeated — the first touch parses each commit once, every further
    * call is O(listing). "Off" is simulated by clearing the memo
    * between calls (entries are pure values; there is nothing a kill
    * switch would protect against that the per-file identity
    * validation doesn't).
    */
  def stressHistoryMemo(spark: SparkSession, commits: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_histmemo_").toFile
    time(s"build_${commits}_commit_log") {
      LakeWriter.writeDelta(spark.range(0, 1000).toDF("id").coalesce(1), dir.getPath)
      (1 to commits).foreach { k =>
        LakeWriter.appendDelta(
          spark.range(k * 1000L, k * 1000L + 50).toDF("id").coalesce(1), dir.getPath)
      }
    }
    def hist(n: Int): Unit =
      (1 to n).foreach(_ => DeltaReader.history(spark, dir.getPath).count())
    hist(2) // warm class loading + the memo
    val p0 = DeltaReader.commitParseCounter.get()
    time(s"50_describe_history_memo_on_${commits}_commits") { hist(50) }
    val parsed = DeltaReader.commitParseCounter.get() - p0
    time(s"50_describe_history_memo_cleared_${commits}_commits") {
      (1 to 50).foreach { _ =>
        DeltaReader.CommitParseCache.clear()
        DeltaReader.history(spark, dir.getPath).count()
      }
    }
    println(s"  memo-on run parsed $parsed commit files across 50 calls")
    // CDF catch-up plan builds ride the same memo (file/cdc actions
    // and per-version timestamps come from the parses history did)
    DeltaReader.CommitParseCache.clear()
    time(s"cdf_plan_build_cold_${commits}_commits") {
      DeltaReader.readChanges(spark, dir.getPath, 0L, commits.toLong)
        .queryExecution.analyzed
    }
    time(s"cdf_plan_build_warm_${commits}_commits") {
      DeltaReader.readChanges(spark, dir.getPath, 0L, commits.toLong)
        .queryExecution.analyzed
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  /** VACUUM's distributed reclaim at file counts a driver loop cannot
    * survive: a live partitioned table plus `nOrphans` failed-writer
    * debris files scattered across its partition directories, then
    * DRY RUN (the walk + filter) and the real reclaim, both
    * distributed. Run twice — GRAFT_EXTRA_CONF="spark.master=local[2]"
    * vs the default local[32] — to see the reclaim phase scale with
    * executor-thread count.
    */
  def stressVacuum(spark: SparkSession, nOrphans: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    val parts = 64
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_vacuum_").toFile
    time(s"create_live_table_${parts}_partitions") {
      LakeWriter.writeDelta(
        spark.range(parts * 2000L)
          .select(col("id"), (col("id") % parts).cast("string").as("p"))
          .repartition(parts * 2), dir.getPath, partitionBy = Seq("p"))
    }
    val liveCount = DeltaReader.snapshot(spark, dir.getPath, None).active.size
    // debris written FROM EXECUTORS into the partition dirs — the
    // shape a fleet of crashed writers leaves behind
    val rootStr = dir.getPath
    time(s"scatter_${nOrphans}_orphans") {
      spark.range(nOrphans.toLong).repartition(64).foreachPartition {
        it: Iterator[java.lang.Long] =>
          it.foreach { i =>
            val f = new java.io.File(
              new java.io.File(rootStr, s"p=${i % parts}"), f"orphan_$i%08d.parquet")
            val out = new java.io.FileOutputStream(f)
            try out.write(1) finally out.close()
          }
      }
    }
    val planned = time(s"vacuum_dry_run_${nOrphans}_candidates") {
      LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 0L, dryRun = true)
    }
    require(planned.size == nOrphans, s"expected $nOrphans candidates, got ${planned.size}")
    val deleted = time(s"vacuum_reclaim_${nOrphans}_orphans") {
      LakeWriter.vacuumDelta(spark, dir.getPath, horizonVersion = 0L)
    }
    require(deleted.size == nOrphans, s"expected $nOrphans deleted, got ${deleted.size}")
    val after = DeltaReader.snapshot(spark, dir.getPath, None).active.size
    require(after == liveCount, s"live files drifted: $liveCount -> $after")
    val cnt = DeltaReader.read(spark, dir.getPath).count()
    require(cnt == parts * 2000L, s"row drift: $cnt")
    println(s"  reclaimed $nOrphans orphans across $parts partition dirs; " +
      s"$liveCount live files untouched")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  def stressDvScatter(spark: SparkSession, files: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    val rowsPerFile = 5000L
    val n = files * rowsPerFile
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_dvscatter_").toFile
    val df = spark.range(n).select(col("id"), (col("id") % 97).as("m"))
      .repartitionByRange(files, col("id"))
    time(s"create_${files}_files_${n}_rows") {
      LakeWriter.writeDelta(df, dir.getPath,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
    }
    def heapMb(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }
    val before = heapMb()
    println(s"  driver heap before delete: ${before} MB")
    time(s"deleteWhereDv_scattered_${n / 2}_rows") {
      val touched = LakeWriter.deleteWhereDv(spark, dir.getPath, "id % 2 = 0")
      println(s"  DV'd ${touched.size} file(s)")
      require(touched.size == files, s"expected all $files files affected, got ${touched.size}")
    }
    val after = heapMb()
    println(s"  driver heap after delete: ${after} MB (delta ${after - before} MB; " +
      s"${n / 2} deleted rows would be ~${n / 2 * 8 / (1024 * 1024)} MB raw on the " +
      "driver if bitmaps were collected)")
    val sidecars = dir.listFiles().count(_.getName.startsWith("deletion_vector_"))
    println(s"  sidecar files written: $sidecars (bounded by shuffle partitions, not files)")
    time("read_back_survivors") {
      val live = DeltaReader.read(spark, dir.getPath)
      val cnt = live.count()
      require(cnt == n / 2, s"expected ${n / 2} survivors, got $cnt")
      val oddEven = live.where("id % 2 = 0").count()
      require(oddEven == 0, s"$oddEven deleted rows resurrected")
      println(s"  survivors $cnt, zero resurrected")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  def stressDeltaMutate(spark: SparkSession, files: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_mutate_").toFile
    val n = files * 100L
    val df = spark.range(n).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(files, col("id"))
    time(s"create_${files}_files")(LakeWriter.writeDelta(df, dir.getPath))
    time("deleteWhere_narrow") {
      val removed = LakeWriter.deleteWhere(spark, dir.getPath, "id >= 110 AND id < 160")
      println(s"  rewrote ${removed.size} file(s)")
    }
    time("deleteWhereDv_narrow") {
      val touched = LakeWriter.deleteWhereDv(spark, dir.getPath, "id >= 300 AND id < 360")
      println(s"  DV'd ${touched.size} file(s)")
    }
    time("updateWhereDv_narrow") {
      val touched = LakeWriter.updateWhereDv(spark, dir.getPath,
        "id >= 500 AND id < 560", Map("v" -> "concat(v, '!')"))
      println(s"  DV'd ${touched.size} file(s), updated rows staged fresh")
    }
    time("mergeInto_10_keys") {
      val src = spark.range(10)
        .select((col("id") * (n / 10) + 777).as("id"), lit("merged").as("v"))
      val rewritten = LakeWriter.mergeInto(spark, dir.getPath, src, Seq("id"))
      println(s"  rewrote ${rewritten.size} file(s)")
    }
    // clause merge (CDC apply): work ∝ files holding the touched keys,
    // not table size — the replication fold's per-batch cost shape
    time("mergeClauses_cdc_20_keys") {
      import graft.sources.{MergeClause, MergeDelete, MergeInsert, MergeUpdate}
      val src = spark.range(20).select(
        (col("id") * (n / 20) + 555).as("id"), lit("cdc").as("v"),
        when(col("id") % 2 === 0, lit("D")).otherwise(lit("U")).as("op"))
      val rewritten = LakeWriter.mergeIntoClauses(spark, dir.getPath, src, Seq("id"),
        matched = Seq(MergeClause(Some("s.op = 'D'"), MergeDelete),
          MergeClause(None, MergeUpdate(Map("v" -> "s.v")))),
        notMatched = Seq(MergeClause(Some("s.op != 'D'"),
          MergeInsert(Map("id" -> "s.id", "v" -> "s.v")))))
      println(s"  rewrote ${rewritten.size} file(s)")
    }
    // insert-only merge must stage new files WITHOUT rewriting any
    time("mergeClauses_insert_only") {
      import graft.sources.{MergeClause, MergeInsertAll}
      val src = spark.range(50)
        .select((col("id") + n + 1000000L).as("id"), lit("new").as("v"))
      val rewritten = LakeWriter.mergeIntoClauses(spark, dir.getPath, src, Seq("id"),
        matched = Nil, notMatched = Seq(MergeClause(None, MergeInsertAll)))
      require(rewritten.isEmpty, s"insert-only merge rewrote ${rewritten.size} files")
      println(s"  rewrote 0 file(s), as required")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)

    // change-feed catch-up: V cdc commits over one shared cdc parquet —
    // readChanges builds one scan branch per version, so this curve is
    // the driver cost a far-behind CDF tail pays per poll (and the
    // reason maxVersionsPerTrigger exists)
    Seq(64, 256).foreach { v =>
      val d2 = java.nio.file.Files.createTempDirectory("graft_stress_cdf_").toFile
      val log = new java.io.File(d2, "_delta_log"); log.mkdirs()
      val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
      import spark.implicits._
      Seq((1L, "x", "delete")).toDF("id", "v", "_change_type")
        .coalesce(1).write.parquet(new java.io.File(d2, "_change_data/stage").getPath)
      val cdcFile = new java.io.File(d2, "_change_data/stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      (0 until v).foreach { i =>
        val head = if (i > 0) Nil else Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
          s"""{"metaData":{"id":"cdf","format":{"provider":"parquet","options":{}},"schemaString":${
            om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"}}}""")
        val lines = head ++ Seq(
          s"""{"cdc":{"path":"_change_data/stage/${cdcFile.getName}","partitionValues":{},"size":100,"dataChange":false}}""")
        java.nio.file.Files.write(new java.io.File(log, f"$i%020d.json").toPath,
          lines.mkString("\n").getBytes("UTF-8"))
      }
      time(s"readChanges_catchup_$v")(
        println(s"  rows = ${DeltaReader.readChanges(spark, d2.getPath, 0L, v - 1L).count()}"))
      org.apache.commons.io.FileUtils.deleteDirectory(d2)
    }
  }

  def stressDelta(spark: SparkSession, n: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_delta_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    time(s"author_${n}_commits") {
      (0 until n).foreach { v =>
        val head = if (v > 0) Nil else Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":"stress","format":{"provider":"parquet","options":{}},"schemaString":${
            om.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{}}}""")
        val lines = head ++ Seq(
          s"""{"txn":{"appId":"sink","version":$v}}""",
          s"""{"add":{"path":"part-$v.parquet","partitionValues":{},"size":100,"modificationTime":0,"dataChange":true}}""")
        java.nio.file.Files.write(
          new java.io.File(log, f"$v%020d.json").toPath,
          lines.mkString("\n").getBytes("UTF-8"))
      }
    }
    // .active.size forces the lazy file resolution — without it the
    // timing would measure only the scalar replay
    (1 to 3).foreach { i =>
      time(s"snapshot_no_cp_$i")(DeltaReader.snapshot(spark, dir.getPath, None).active.size)
    }
    time("lastTxn_no_cp")(
      println(s"  watermark = ${DeltaReader.lastTxnVersion(spark, dir.getPath, "sink")}"))
    // LOG COMPACTION instead of a checkpoint: the commit suffix folds
    // into one reconciled JSON, and replay substitutes it
    time(s"compact_log_0_to_${n - 101}")(
      LakeWriter.compactLog(spark, dir.getPath, 0L, (n - 101).toLong))
    (1 to 3).foreach { i =>
      time(s"snapshot_logcompacted_$i")(
        DeltaReader.snapshot(spark, dir.getPath, None).active.size)
    }
    time("checkpoint_at_n-101")(
      LakeWriter.checkpointDelta(spark, dir.getPath, (n - 101).toLong))
    (1 to 3).foreach { i =>
      time(s"snapshot_cp100_$i")(DeltaReader.snapshot(spark, dir.getPath, None).active.size)
    }
    time("checkpoint_at_n-1")(
      LakeWriter.checkpointDelta(spark, dir.getPath, (n - 1).toLong))
    (1 to 3).foreach { i =>
      time(s"snapshot_cp0_$i")(DeltaReader.snapshot(spark, dir.getPath, None).active.size)
    }
    time("lastTxn_cp0")(
      println(s"  watermark = ${DeltaReader.lastTxnVersion(spark, dir.getPath, "sink")}"))
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  /** Snapshot resolution at FILE-COUNT scale (the 100-TB axis: a
    * checkpoint with n add entries): proves the checkpoint is never
    * collected wholesale — scalar-only snapshot access stays O(1) in
    * file count, forcing `.active` pays exactly one distributed
    * resolve + gated collect, and the maxSnapshotFiles gate refuses
    * past its bound.
    */
  def stressDeltaFiles(spark: SparkSession, n: Int): Unit = {
    import graft.sources.DeltaReader
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_dfiles_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    time(s"author_checkpoint_${n}_adds") {
      val adds = spark.range(0, n, 1, 32).selectExpr(
        "named_struct('path', concat('part-', id, '.parquet'), " +
          "'partitionValues', map('p', cast(id % 100 as string)), " +
          "'size', 100L, 'modificationTime', 0L) AS add")
      val scalars = spark.range(1).select(
        struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion")).as("protocol"),
        struct(lit("stress-files").as("id"),
          struct(lit("parquet").as("provider"),
            map().cast("map<string,string>").as("options")).as("format"),
          lit(schema.json).as("schemaString"),
          array().cast("array<string>").as("partitionColumns"),
          map().cast("map<string,string>").as("configuration")).as("metaData"))
      val stage = new java.io.File(dir, "_cp_stage")
      adds.unionByName(scalars, allowMissingColumns = true)
        .coalesce(1).write.parquet(stage.getPath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(log, "00000000000000000000.checkpoint.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    def usedMB: Long = {
      System.gc()
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1024 * 1024)
    }
    (1 to 3).foreach { i =>
      time(s"snapshot_scalars_$i") {
        val sn = DeltaReader.snapshot(spark, dir.getPath, None)
        require(sn.version == 0 && sn.txns.isEmpty)
      }
    }
    println(s"[profile] heap_scalars_only          $usedMB MB")
    (1 to 3).foreach { i =>
      time(s"snapshot_active_$i") {
        val k = DeltaReader.snapshot(spark, dir.getPath, None).active.size
        require(k == n, s"resolved $k of $n adds")
      }
    }
    println(s"[profile] heap_after_active          $usedMB MB")
    // commit suffix on top of the huge checkpoint: the anti-join path
    time("author_50_suffix_commits") {
      (1 to 50).foreach { v =>
        val lines = Seq(
          s"""{"remove":{"path":"part-$v.parquet","deletionTimestamp":0,"dataChange":true}}""",
          s"""{"add":{"path":"part-new-$v.parquet","partitionValues":{"p":"0"},"size":100,"modificationTime":0,"dataChange":true}}""")
        java.nio.file.Files.write(new java.io.File(log, f"$v%020d.json").toPath,
          lines.mkString("\n").getBytes("UTF-8"))
      }
    }
    time("snapshot_active_suffix") {
      val k = DeltaReader.snapshot(spark, dir.getPath, None).active.size
      require(k == n, s"suffix-resolved $k, expected $n")
    }
    // the gate: a live set past maxSnapshotFiles refuses rather than
    // silently eating driver heap
    spark.conf.set("spark.graft.delta.maxSnapshotFiles", (n / 2).toString)
    try {
      DeltaReader.snapshot(spark, dir.getPath, None).active
      println("[profile] GATE FAILED TO FIRE")
    } catch {
      case e: IllegalArgumentException =>
        println(s"[profile] gate refused as designed: ${e.getMessage.linesIterator.next()}")
    } finally spark.conf.unset("spark.graft.delta.maxSnapshotFiles")
    // checkpoint AUTHORSHIP at the same scale: the add rows flow
    // checkpoint-scan → suffix anti-join → parquet write entirely on
    // executors (Snapshot.activeDf) — no driver file list at any size
    time(s"checkpoint_author_multipart_$n") {
      graft.sources.LakeWriter.checkpointDelta(spark, dir.getPath, 50L, parts = 4)
    }
    time("snapshot_scalars_from_authored_cp") {
      require(DeltaReader.snapshot(spark, dir.getPath, None).version == 50)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  /** Shallow clone + DESCRIBE DETAIL at checkpoint scale: author a
    * synthetic n-add checkpoint (clone writes METADATA only, so the
    * data files need not exist), then time cloneDelta / the clone's
    * snapshot scalars / detail on both.
    */
  def stressDeltaClone(spark: SparkSession, n: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_clone_").toFile
    val log = new java.io.File(dir, "_delta_log")
    log.mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    time(s"author_checkpoint_${n}_adds") {
      val adds = spark.range(0, n, 1, 32).selectExpr(
        "named_struct('path', concat('part-', id, '.parquet'), " +
          "'partitionValues', map('p', cast(id % 100 as string)), " +
          "'size', 100L, 'modificationTime', 0L) AS add")
      val scalars = spark.range(1).select(
        struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion")).as("protocol"),
        struct(lit("stress-clone").as("id"),
          struct(lit("parquet").as("provider"),
            map().cast("map<string,string>").as("options")).as("format"),
          lit(schema.json).as("schemaString"),
          array().cast("array<string>").as("partitionColumns"),
          map().cast("map<string,string>").as("configuration")).as("metaData"))
      val stage = new java.io.File(dir, "_cp_stage")
      adds.unionByName(scalars, allowMissingColumns = true)
        .coalesce(1).write.parquet(stage.getPath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(log, "00000000000000000000.checkpoint.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    val cloneDir = new java.io.File(dir.getParentFile, dir.getName + "_clone").getPath
    time(s"clone_${n}_files") {
      val k = LakeWriter.cloneDelta(spark, dir.getPath, cloneDir)
      require(k == n, s"cloned $k of $n")
    }
    (1 to 3).foreach { i =>
      time(s"clone_snapshot_scalars_$i") {
        require(DeltaReader.snapshot(spark, cloneDir, None).version == 0)
      }
    }
    time(s"clone_detail_$n") {
      val d = DeltaReader.detail(spark, cloneDir).collect()(0)
      require(d.getAs[Long]("numFiles") == n)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cloneDir))
  }

  /** convertToDelta at landing-zone scale: n real parquet files
    * (footers must be read for stats), timed end-to-end, then the
    * immediate post-convert pruned read.
    */
  /** Retention cleanup at commit-count scale: a fabricated log of `n`
    * one-add commits, a checkpoint at the head, every commit below it
    * aged past retention — ONE cleanExpiredLogs call must delete all
    * `n` (executor-parallel above the 64-victim inline threshold; a
    * year of minute-commits is ~500k files, where driver-sequential
    * deletes at object-store latency would stall the checkpoint hook
    * for half an hour), and the head checkpoint + json must still
    * reconstruct the full state.
    */
  def stressLogClean(spark: SparkSession, n: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_logclean_").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json
    time(s"author_${n}_commit_log") {
      def write(name: String, s: String): Unit = {
        val w = new java.io.FileWriter(new java.io.File(log, name))
        try w.write(s) finally w.close()
      }
      write(f"${0L}%020d.json",
        s"""{"commitInfo":{"timestamp":0,"operation":"CREATE TABLE","operationParameters":{},"engineInfo":"graft"}}
           |{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
           |{"metaData":{"id":"stress-logclean","format":{"provider":"parquet","options":{}},"schemaString":${om.writeValueAsString(schemaJson)},"partitionColumns":[],"configuration":{}}}""".stripMargin)
      (1 to n).foreach { v =>
        write(f"$v%020d.json",
          s"""{"commitInfo":{"timestamp":0,"operation":"WRITE","operationParameters":{},"readVersion":${v - 1},"engineInfo":"graft"}}
             |{"add":{"path":"part-$v.parquet","partitionValues":{},"size":100,"modificationTime":0,"dataChange":true,"stats":"{\\"numRecords\\":1}"}}""".stripMargin)
      }
    }
    // the checkpoint's own cleanup hook is a no-op here (files fresh)
    time(s"checkpoint_at_$n") { LakeWriter.checkpointDelta(spark, dir.getPath, n) }
    val old = System.currentTimeMillis() - 40L * 86400000L
    time(s"age_${n}_commits") {
      (0 until n).foreach(v =>
        new java.io.File(log, f"$v%020d.json").setLastModified(old))
    }
    time(s"clean_${n}_expired_commits") {
      val deleted = LakeWriter.cleanExpiredLogs(spark, dir.getPath)
      require(deleted.size == n, s"expected $n deletions, got ${deleted.size}")
    }
    time("post_clean_snapshot") {
      val sn = DeltaReader.snapshot(spark, dir.getPath, None)
      require(sn.version == n, s"version ${sn.version}")
      require(sn.active.size == n, s"active ${sn.active.size}")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  def stressConvert(spark: SparkSession, n: Int): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_conv_").toFile.getPath
    time(s"write_${n}_files") {
      spark.range(0, n * 10L, 1, n).selectExpr("id", "id * 2 AS v")
        .write.mode("append").parquet(dir)
    }
    time(s"convert_${n}_files") {
      val k = LakeWriter.convertToDelta(spark, dir)
      require(k == n, s"converted $k of $n")
    }
    time("post_convert_pruned_read") {
      require(DeltaReader.readWhere(spark, dir, s"id = ${n * 5L}").count() == 1)
    }
    time("post_convert_full_count") {
      require(DeltaReader.read(spark, dir).count() == n * 10L)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  /** recall@3 vs brute force for every approximate ANN variant across
    * its tuning axis — the published curve a user choosing
    * bits/nCells/nProbe reads (SURVEY §4c).
    */
  def annRecall(spark: SparkSession, dir: String): Unit = {
    import graft.sim.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 100)
    val exact = Similarity.bruteForceKnnBlocked(q, emb, 3)
    exact.cache().count()
    def r(name: String)(approx: => org.apache.spark.sql.DataFrame): Unit = {
      val row = Similarity.recallAtK(approx.where(col("vec_id") < 100), exact)
        .collect()(0)
      println(f"[profile] recall $name%-22s ${row.getAs[Double]("recall")}%.4f")
    }
    Seq(4, 6, 8).foreach(b => r(s"lsh_bits$b")(Similarity.lshKnn(emb, 3, bits = b)))
    Seq(8, 16, 32).foreach(c => r(s"ivf_cells$c")(Similarity.ivfKnn(emb, 3, nCells = c)))
    Seq(4, 6, 8).foreach(b => r(s"pq_m8_bits$b")(Similarity.pqKnn(q, emb, 3, bits = b)))
    r("pq_m16_bits4")(Similarity.pqKnn(q, emb, 3, m = 16))
    // rerank = 0 isolates the ADC-only curve (rerank defaults to 32)
    Seq(2, 4, 8, 16).foreach(p =>
      r(s"ivfpq_probe$p")(Similarity.ivfPqKnn(q, emb, 3, nProbe = p, rerank = 0)))
    r("ivfpq_p4_rerank32")(Similarity.ivfPqKnn(q, emb, 3, rerank = 32))
    r("ivfpq_p8_rerank32")(Similarity.ivfPqKnn(q, emb, 3, nProbe = 8, rerank = 32))
  }

  def stressMerged(spark: SparkSession, nTables: Int): Unit = {
    import graft.index.LakeIndexer
    import graft.sources.LakeReader
    val dir = java.nio.file.Files.createTempDirectory("graft_widelake_")
    time(s"write_${nTables}_csv_files") {
      (1 to nTables).foreach { i =>
        val rows = (0 until 20).map(r => s"$r,t$i-$r,${r * i}").mkString("\n")
        java.nio.file.Files.writeString(dir.resolve(s"t$i.csv"), s"k,name,v\n$rows\n")
      }
    }
    val (groups, catalog, errors) =
      time("read_folder_merged")(LakeReader.readFolderMerged(spark, dir.toString))
    println(s"[profile] groups=${groups.size} tables=${catalog.size} errors=$errors")
    val cells = LakeIndexer.cellsMerged(groups)
    time("cells_analyze")(cells.queryExecution.analyzed)
    time("cells_optimize")(cells.queryExecution.executedPlan)
    time("cells_count")(cells.count())
    time("cells_count2")(cells.count())
    time("table_info_count")(
      LakeIndexer.tableInfoMerged(spark, groups, catalog).count())
  }

  /** The OTHER merged-lake regime: few LARGE tables. Writes 4 csv
    * files of `rows` rows each and forces multi-split scans
    * (maxPartitionBytes=8m), so the per-table `__rid` assignment is
    * the variable under test — the row_number-window design funnels
    * each table through one reducer; the split-offsets design stays
    * fully parallel. Timed twice (pass 2 = steady state).
    */
  def stressMergedRows(spark: SparkSession, rows: Int): Unit = {
    import graft.index.LakeIndexer
    import graft.sources.LakeReader
    val dir = java.nio.file.Files.createTempDirectory("graft_biglake_")
    time(s"write_4x${rows}_csv") {
      (1 to 4).foreach { i =>
        val sb = new StringBuilder("k,name,v\n")
        (0 until rows).foreach(r => sb.append(r).append(",t").append(i)
          .append('-').append(r).append(',').append(r.toLong * i).append('\n'))
        java.nio.file.Files.writeString(dir.resolve(s"t$i.csv"), sb.toString)
      }
    }
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    try {
      val (groups, catalog, errors) =
        time("read_folder_merged")(LakeReader.readFolderMerged(spark, dir.toString))
      println(s"[profile] groups=${groups.size} tables=${catalog.size} errors=$errors")
      val cells = LakeIndexer.cellsMerged(groups)
      time("cells_count")(cells.count())
      time("cells_count2")(cells.count())
      // the id assignment alone (no tokenize/explode): max rid per table
      val g = groups.head.df
      time("rid_max")(g.groupBy("tableid")
        .agg(org.apache.spark.sql.functions.max("__rid")).collect())
      time("rid_max2")(g.groupBy("tableid")
        .agg(org.apache.spark.sql.functions.max("__rid")).collect())
    } finally prev.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
      v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
  }

  /** Phase breakdown of the delta_merge / delta_delete harness rows:
    * fixture write vs mutation vs read-back, run twice (steady state =
    * the second pass, everything JIT/codegen-warm).
    */
  /** Times each cache_build_pipeline component SOLO (same products as
    * PipelineQueries' private caches), two passes on fresh sessions so
    * pass 2 is code-warm but cache-cold.
    */
  def pipelinePhases(spark: SparkSession, dir: String): Unit = {
    def docs(s: SparkSession) = s.read.parquet(s"$dir/documents.parquet")
    def emb(s: SparkSession) = s.read.parquet(s"$dir/embeddings.parquet")
    (1 to 2).foreach { pass =>
      val s = spark.newSession()
      time(s"p$pass.jacPairs")(graft.dedup.Dedup.ngramJaccard(docs(s), 0.5).count())
      time(s"p$pass.docSpans")(graft.dedup.Dedup.duplicateSpans(docs(s), 5, 8).count())
      time(s"p$pass.embCells")(graft.sim.Similarity.assignCells(emb(s), 16, 42L).count())
      time(s"p$pass.contamSpans")(graft.dedup.Dedup.duplicateSpansAcross(
        docs(s).where(col("doc_id") % 50 =!= 0),
        docs(s).where(col("doc_id") % 50 === 0), 5, 8).count())
      time(s"p$pass.dsirW") {
        val d = docs(s)
        graft.text.Dsir.importanceWeights(d, d.where(col("lang") === "en")).count()
      }
      time(s"p$pass.bpe")(graft.text.Bpe.trainWithVocab(
        graft.text.Bpe.wordCounts(docs(s)), 64))
    }
  }

  def deltaPhases(spark: SparkSession, dir: String): Unit = {
    import graft.sources.{DeltaReader, LakeWriter}
    for (pass <- 1 to 2) {
      val d = java.nio.file.Files.createTempDirectory(s"graft_ph_$pass").resolve("tbl")
        .toAbsolutePath.toString
      val base = graft.queries.Q.t(spark, dir, "orders").where("o_orderkey % 10 < 6").repartition(4)
      time(s"p$pass.writeDelta")(LakeWriter.writeDelta(base, d))
      time(s"p$pass.snapshot")(DeltaReader.snapshot(spark, d, None))
      time(s"p$pass.delete_sql")(
        spark.sql(s"DELETE FROM graft_delta.`$d` WHERE o_orderkey % 3 = 0"))
      time(s"p$pass.read_agg") {
        DeltaReader.read(spark, d).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt")).orderBy("o_orderstatus").count()
      }
      val src = graft.queries.Q.t(spark, dir, "orders")
        .where("o_orderkey % 10 >= 4 AND o_orderkey % 10 < 8")
        .withColumn("o_orderstatus", lit("M"))
      src.createOrReplaceTempView("graft_ph_src")
      time(s"p$pass.merge_sql")(
        spark.sql(s"""MERGE INTO graft_delta.`$d` AS t USING graft_ph_src AS src
          ON t.o_orderkey = src.o_orderkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *"""))
      time(s"p$pass.read_agg2") {
        DeltaReader.read(spark, d).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt")).orderBy("o_orderstatus").count()
      }
      time(s"p$pass.append")(LakeWriter.appendDelta(
        graft.queries.Q.t(spark, dir, "orders").where("o_orderkey % 10 >= 8").repartition(2), d))
    }
  }

  /** Per-Spark-job wall time for one query (index + shared caches
    * prebuilt, warm — the same conditions Bench times queries under).
    */
  def jobProfile(spark: SparkSession, dir: String, query: String): Unit = {
    graft.index.TestLake.cells(spark, dir).count()
    graft.index.TestLake.cellsBloom(spark, dir).count()
    graft.queries.DiscoveryQueries.warmCaches(spark, dir)
    graft.queries.PipelineQueries.warmCaches(spark, dir)
    graft.queries.DupQueries.warmCaches(spark, dir)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val tasks = e.stageInfos.map(_.numTasks).sum
        val site = e.stageInfos.lastOption.map(si => si.name + " @ " + si.details.linesIterator.take(1).mkString).getOrElse("")
        starts.put(e.jobId, (e.time, s"${e.stageInfos.size}st/${tasks}t $site"))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, desc) =>
          println(f"[job] ${e.jobId}%3d ${(e.time - t0) / 1000.0}%7.2f s  ${desc.take(140)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time(query)(SparkEntry.queries(query)(spark, dir).count())
    spark.sparkContext.removeSparkListener(listener)
  }

  /** [[jobProfile]] without the cache warm-up, with job START offsets
    * from the query's t0 — the gaps BETWEEN jobs are driver-side work
    * (snapshot replay, commit funnel, footer stats), which is what the
    * Delta machinery rows are suspected of spending their time on.
    * Runs the query twice (bench takes min-of-2; pass 2 is the
    * steady-state cost).
    */
  /** Times every shared-cache component SOLO, twice (fresh session per
    * pass so each pass rebuilds): splits the cache_build families into
    * their constituent builds. Components within a family run in the
    * family's declared order; pass 2 is the steady-state number.
    */
  def warmComponents(spark: SparkSession, dir: String): Unit = {
    val fams: Seq[(String, Seq[(String, (SparkSession, String) => Unit)])] = Seq(
      "discovery" -> graft.queries.DiscoveryQueries.warmComponents,
      "pipeline" -> graft.queries.PipelineQueries.warmComponents,
      "dup" -> graft.queries.DupQueries.warmComponents)
    (1 to 2).foreach { pass =>
      fams.foreach { case (fam, comps) =>
        val s = spark.newSession()
        val t0 = System.nanoTime()
        comps.foreach { case (n, f) => time(s"$n($pass)")(f(s, dir)) }
        val famLabel = s"fam_$fam($pass)"
        println(f"[profile] $famLabel%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        spark.catalog.clearCache(); System.gc()
      }
    }
  }

  /** Isolates the Delta CREATE write's cost next to a plain parquet
    * write of the SAME frame — the difference is the whole commit
    * funnel (staging indirection + stats + renames + log).
    */
  def writePhases(spark: SparkSession, dir: String): Unit = {
    import graft.sources.LakeWriter
    for (pass <- 1 to 3) {
      val base = graft.queries.Q.t(spark, dir, "orders")
        .where("o_orderkey % 10 < 6").repartition(4)
      val plain = java.nio.file.Files.createTempDirectory(s"graft_wp_p$pass")
        .resolve("plain").toAbsolutePath.toString
      time(s"p$pass.plain_parquet")(base.write.parquet(plain))
      val d = java.nio.file.Files.createTempDirectory(s"graft_wp_d$pass")
        .resolve("tbl").toAbsolutePath.toString
      time(s"p$pass.writeDelta")(LakeWriter.writeDelta(base, d))
      val d2 = java.nio.file.Files.createTempDirectory(s"graft_wp_a$pass")
        .resolve("tbl").toAbsolutePath.toString
      time(s"p$pass.writeDelta2")(LakeWriter.writeDelta(base, d2))
      time(s"p$pass.append")(LakeWriter.appendDelta(
        graft.queries.Q.t(spark, dir, "orders").where("o_orderkey % 10 >= 8")
          .repartition(2), d2))
      time(s"p$pass.read_count")(graft.sources.DeltaReader.read(spark, d2).count())
    }
  }

  def jobProfileNoWarm(spark: SparkSession, dir: String, query: String): Unit = {
    @volatile var t0 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val tasks = e.stageInfos.map(_.numTasks).sum
        val site = e.stageInfos.lastOption.map(si =>
          si.name + " @ " + si.details.linesIterator.take(1).mkString).getOrElse("")
        starts.put(e.jobId, (e.time, s"${e.stageInfos.size}st/${tasks}t $site"))
        println(f"[job-start] ${e.jobId}%3d at ${(e.time * 1000000L - t0) / 1e9}%7.3f s")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (s0, desc) =>
          println(f"[job] ${e.jobId}%3d ${(e.time - s0) / 1000.0}%7.2f s  ${desc.take(140)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t0 = System.nanoTime()
    time(s"${query}_pass1")(SparkEntry.queries(query)(spark, dir).count())
    t0 = System.nanoTime()
    time(s"${query}_pass2")(SparkEntry.queries(query)(spark, dir).count())
    spark.sparkContext.removeSparkListener(listener)
  }

  def explainPlans(spark: SparkSession, dir: String): Unit = {
    for (q <- Seq("q6_filter", "q5_multijoin", "q3_join", "mate_single", "dedup_jaccard",
        "tfidf_topk", "bm25_search", "cell_index_merged",
        "dsir_weights", "line_dedup", "quality_gopher", "pii_signals",
        "topk_rewrite", "html_extract", "url_normalize", "weighted_sample",
        "source_overlap", "corpus_report", "graph_degrees")) {
      println(s"==== $q ====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
  }

  def dupTables(spark: SparkSession, dir: String): Unit = {
    time("dup_tables")(SparkEntry.queries("dup_tables")(spark, dir).count())
    time("dup_tables_again")(SparkEntry.queries("dup_tables")(spark, dir).count())
  }

  /** PageRank at edge scale: a synthetic power-law-ish directed graph
    * (hub skew via the modulo square), timing the edge prep and each
    * phase of the iterative loop. The per-iteration cost is ONE
    * edges⋈ranks shuffle + one groupBy — the number that must stay
    * linear as the graph grows.
    */
  def stressGraph(spark: SparkSession, nEdges: Int): Unit = {
    val e = spark.range(0, nEdges, 1, 32).selectExpr(
      "pmod(hash(id), 200000) AS src",
      // quadratic skew: low dst ids collect disproportionate in-degree
      "pmod(CAST(hash(id + 7) AS BIGINT) * pmod(hash(id + 7), 447), 200000) + 200000 AS dst")
    time(s"pagerank_3it_${nEdges}_edges")(
      graft.graph.GraphOps.pagerank(e, iterations = 3).count())
    time(s"pagerank_10it_${nEdges}_edges")(
      graft.graph.GraphOps.pagerank(e, iterations = 10).count())
    time("degrees")(graft.graph.GraphOps.degrees(e).count())
  }

  /** The TopK rewrite's measured win: the row_number window idiom vs
    * the auto-rewritten heap plan on a many-keys corpus (k·keys ≪ rows,
    * the regime the operator exists for).
    */
  def stressTopk(spark: SparkSession, nRows: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.range(0, nRows, 1, 32).selectExpr(
      "pmod(hash(id), 100000) AS k", "id AS v", "hash(id, 1) AS o").cache()
    time(s"materialize_${nRows}_rows")(df.count())
    def idiom = df.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("o"), col("v"))))
      .where(col("rn") <= 5).drop("rn")
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    time("window_sort_topk")(idiom.count())
    time("window_sort_topk_2")(idiom.count())
    spark.conf.set("spark.graft.topkRewrite.enabled", "true")
    time("heap_rewrite_topk")(idiom.count())
    time("heap_rewrite_topk_2")(idiom.count())
    df.unpersist()
  }

  /** Catch-up throughput of the registered "graft-delta" streaming
    * source: a table with `versions` commits, drained cold through
    * `readStream` (Trigger.AvailableNow) two ways. Snapshot mode
    * collapses all committed versions into one consistent first batch
    * (one snapshot replay + one distributed scan — NOT per-version
    * work), so its wall time is the floor. CDF replay from v0 with
    * `maxVersionsPerTrigger`=10 walks the history in capped batches
    * (ceil(versions/10) triggers); per-batch driver cost should be
    * flat KB-scale JSON parses, so the two drains bound the range a
    * restarted consumer pays between "resume near head" and "replay
    * everything version-wise".
    */
  def stressStream(spark: SparkSession, versions: Int): Unit = {
    import graft.sources.LakeWriter
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_stream")
      .resolve("t").toAbsolutePath.toString
    val rowsPerVersion = 20000L
    time(s"build_${versions}_versions") {
      LakeWriter.writeDelta(
        spark.range(0, rowsPerVersion, 1, 4).selectExpr("id", "id * 2 AS v"), dir,
        configuration = Map("delta.enableChangeDataFeed" -> "true"))
      (1 until versions).foreach { i =>
        LakeWriter.appendDelta(
          spark.range(i * rowsPerVersion, (i + 1) * rowsPerVersion, 1, 4)
            .selectExpr("id", "id * 2 AS v"), dir)
      }
    }
    def drain(label: String, opts: Map[String, String], expectBatches: Int): Unit = {
      val cp = java.nio.file.Files.createTempDirectory("graft_stress_cp")
        .toAbsolutePath.toString
      val n = new java.util.concurrent.atomic.AtomicLong
      val batches = new java.util.concurrent.atomic.AtomicInteger
      time(s"drain_$label") {
        var reader = spark.readStream.format("graft-delta")
        opts.foreach { case (k, v) => reader = reader.option(k, v) }
        val q = reader.load(dir).writeStream
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            n.addAndGet(df.count()); batches.incrementAndGet(); ()
          }
          .start()
        q.awaitTermination()
      }
      println(s"[profile] $label: ${n.get()} rows in ${batches.get()} batches " +
        s"(expect ${versions * rowsPerVersion} rows / ~$expectBatches batches)")
      require(n.get() == versions * rowsPerVersion, s"lost rows: ${n.get()}")
      require(batches.get() == expectBatches,
        s"$label: ${batches.get()} batches, expected $expectBatches")
    }
    drain("snapshot", Map.empty, expectBatches = 1)
    drain("cdf_replay_cap=10",
      Map("readChangeFeed" -> "true", "startingVersion" -> "0",
        "maxVersionsPerTrigger" -> "10"),
      expectBatches = (versions + 9) / 10)
  }

  /** Stage-count linearity of EventAnalytics.funnel: per-stage
    * localCheckpoints truncate lineage, so jobs and wall time must grow
    * ~linearly in K (the naive per-stage count() lineage re-runs stages
    * 1..i-1 for every stage i — K(K+1)/2 aggregate passes). Runs the
    * same funnel at K/2 and K and prints the job-count ratio (linear ⇒
    * ≈2.0, quadratic ⇒ ≈4.0); every user converts every stage, so the
    * shrinking-set effect cannot mask the lineage shape.
    */
  def stressFunnel(spark: SparkSession, k: Int): Unit = {
    require(k >= 4 && k % 2 == 0, s"stress-funnel: need an even K >= 4, got $k")
    val users = 200000L
    def run(stages: Int): Long = {
      val ev = spark.range(0, users * stages, 1, 32)
        .selectExpr(s"id % ${users}L AS user_id", s"id DIV ${users}L AS s")
        .selectExpr("user_id", "s * 1000000000L + user_id AS ts",
          "concat('s', s + 1) AS event_type")
      val names = (1 to stages).map(i => s"s$i")
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      val rows = time(s"funnel_K$stages")(
        graft.ops.EventAnalytics.funnel(ev, names, 10L * 1000 * 1000 * 1000)
          .collect())
      Thread.sleep(500) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      require(rows.length == stages && rows.forall(_.getLong(2) == users),
        s"funnel_K$stages: expected $stages stages x $users users, got " +
          rows.map(r => (r.getInt(0), r.getLong(2))).mkString(","))
      jobs.get().toLong
    }
    val jHalf = run(k / 2)
    val jFull = run(k)
    println(f"[profile] jobs K=${k / 2}: $jHalf, K=$k: $jFull, " +
      f"ratio ${jFull.toDouble / jHalf}%.2f (linear => ~2.0, quadratic => ~4.0)")
  }
}
