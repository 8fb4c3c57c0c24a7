package graft

import graft.sources.{DeltaReader, DeltaStats, LakeWriter}

/** File statistics (add.stats) + data skipping: footer-derived stats
  * land in every add action, survive checkpoint replay, and the
  * pruner keeps exactly the files a predicate may match — never
  * dropping a matching one (soundness re-checked by equality against
  * the unpruned read).
  */
class DeltaStatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  /** A 4-file table with tight disjoint id ranges per file. */
  private def rangedTable(dir: String): Unit = {
    val s = spark
    import s.implicits._
    val df = s.range(400).selectExpr("id", "concat('v', id) AS v",
      "CASE WHEN id % 100 = 0 THEN NULL ELSE CAST(id AS DOUBLE) END AS w")
    LakeWriter.writeDelta(df.repartitionByRange(4, org.apache.spark.sql.functions.col("id")), dir)
  }

  test("writeDelta emits footer stats; checkpoint replay preserves them") {
    val dir = tmp("graft_stats_")
    rangedTable(dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.size == 4)
    snap.active.foreach { a =>
      assert(a.stats.isDefined, s"add ${a.path} carries no stats")
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(a.stats.get)
      assert(n.get("numRecords").asLong() == 100L)
      assert(n.get("minValues").has("id") && n.get("maxValues").has("id"))
      assert(n.get("minValues").has("v"), "string stats missing")
      assert(n.get("nullCount").has("w"))
      // each file's id envelope is tight (disjoint 100-row ranges)
      assert(n.get("maxValues").get("id").asLong() -
        n.get("minValues").get("id").asLong() < 100L)
    }
    // nullCount: exactly one NULL w per 100-row file (id % 100 == 0)
    assert(snap.active.map(a => new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(a.stats.get).get("nullCount").get("w").asLong()).sum == 4L)

    LakeWriter.checkpointDelta(spark, dir, 0L)
    // force replay THROUGH the checkpoint by cleaning the commit json
    val v0 = new java.io.File(dir, "_delta_log/" + "0" * 20 + ".json")
    assert(v0.delete())
    val replayed = DeltaReader.snapshot(spark, dir, None)
    assert(replayed.active.forall(_.stats.isDefined),
      "stats lost through checkpoint replay")
  }

  test("prune keeps only envelope-compatible files; readWhere equals read().where") {
    val dir = tmp("graft_stats_prune_")
    rangedTable(dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    // a narrow id predicate keeps one file
    assert(DeltaStats.prune(spark, snap.active, "id >= 110 AND id < 160", snap).size == 1)
    // an impossible predicate keeps none
    assert(DeltaStats.prune(spark, snap.active, "id > 10000", snap).isEmpty)
    // equality inside one range keeps that file only
    assert(DeltaStats.prune(spark, snap.active, "id = 250", snap).size == 1)
    // IN across two ranges keeps two
    assert(DeltaStats.prune(spark, snap.active, "id IN (50, 350)", snap).size == 2)
    // IS NULL on w keeps all (each file holds one null); IS NULL on id none
    assert(DeltaStats.prune(spark, snap.active, "w IS NULL", snap).size == 4)
    assert(DeltaStats.prune(spark, snap.active, "id IS NULL", snap).isEmpty)
    // an unsupported shape is conservative
    assert(DeltaStats.prune(spark, snap.active, "id % 7 = 3", snap).size == 4)
    // OR composition
    assert(DeltaStats.prune(spark, snap.active, "id < 50 OR id >= 390", snap).size == 2)
    // soundness end-to-end: pruned read ≡ unpruned filtered read
    val s = spark
    import s.implicits._
    val a = DeltaReader.readWhere(spark, dir, "id >= 95 AND id < 210 AND v <> 'v100'")
      .select("id").as[Long].collect().toSet
    val b = DeltaReader.read(spark, dir).where("id >= 95 AND id < 210 AND v <> 'v100'")
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("partition values prune through the same evaluator") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_stats_pv_")
    LakeWriter.writeDelta(
      Seq((0L, "x"), (1L, "x"), (2L, "y")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val snap = DeltaReader.snapshot(spark, dir, None)
    val kept = DeltaStats.prune(spark, snap.active, "p = 'x' AND id >= 1", snap)
    assert(kept.forall(_.partitionValues.get("p").contains("x")))
    assert(DeltaStats.prune(spark, snap.active, "p = 'z'", snap).isEmpty)
  }

  test("mutations stay exact under pruning and string stats stay conservative on non-ASCII") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_stats_mut_")
    rangedTable(dir)
    // a narrow delete touches (and rewrites) exactly one file
    val removed = LakeWriter.deleteWhere(spark, dir, "id >= 110 AND id < 160")
    assert(removed.size == 1)
    assert(DeltaReader.read(spark, dir).count() == 350L)
    // the rewritten file's NEW add carries fresh stats too
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.forall(_.stats.isDefined))

    // non-ASCII strings prune in code-point order: 'zzz' sorts BELOW
    // the file's ['ábc', 'żółw'] envelope (z = U+007A < á = U+00E1),
    // so the file skips — while a value inside the envelope keeps it
    val dir2 = tmp("graft_stats_uni_")
    LakeWriter.writeDelta(Seq((0L, "żółw"), (1L, "ábc")).toDF("id", "v")
      .coalesce(1), dir2)
    val snap2 = DeltaReader.snapshot(spark, dir2, None)
    assert(DeltaStats.prune(spark, snap2.active, "v = 'zzz'", snap2).isEmpty)
    assert(DeltaStats.prune(spark, snap2.active, "v = 'émil'", snap2).size == 1)
    assert(DeltaReader.readWhere(spark, dir2, "v = 'zzz'").count() ==
      DeltaReader.read(spark, dir2).where("v = 'zzz'").count())
  }

  /** One 4-file range-laid-out table with a DATE, both TIMESTAMP
    * kinds and a DECIMAL column, each monotone in id — every typed
    * family gets a tight disjoint per-file envelope.
    */
  private def typedTable(dir: String): Unit = {
    val df = spark.range(400).selectExpr(
      "id",
      "date_add(DATE'2024-01-01', CAST(id AS INT)) AS d",
      "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS tn",
      "timestamp'2024-01-01 00:00:00Z' + make_interval(0,0,0,0,0,0,id*60) AS tl",
      "CAST(id AS DECIMAL(20,2)) / 4 AS dec")
    LakeWriter.writeDelta(
      df.repartitionByRange(4, org.apache.spark.sql.functions.col("id")), dir)
  }

  test("typed stats land in add.stats: date/timestamp/ntz as ISO text, decimal as a number") {
    val dir = tmp("graft_stats_typed_")
    typedTable(dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val first = snap.active.map { a =>
      val n = om.readTree(a.stats.get)
      (n.get("minValues"), n.get("maxValues"))
    }.minBy(_._1.get("id").asLong())
    assert(first._1.get("d").asText() == "2024-01-01", first._1.toString)
    assert(first._2.get("d").asText() == "2024-04-09")
    assert(first._1.get("tn").asText() == "2024-01-01T00:00:00.000000")
    assert(first._2.get("tn").asText() == "2024-01-01T01:39:00.000000")
    assert(first._1.get("tl").asText() == "2024-01-01T00:00:00.000000Z")
    assert(first._1.get("dec").isNumber &&
      first._1.get("dec").decimalValue().compareTo(new java.math.BigDecimal("0")) == 0,
      first._1.toString)
    assert(first._2.get("dec").decimalValue()
      .compareTo(new java.math.BigDecimal("24.75")) == 0, first._2.toString)
  }

  test("date / timestamp / ntz / decimal predicates prune files and stay exact vs the unpruned read") {
    val dir = tmp("graft_stats_tprune_")
    typedTable(dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    // DATE literal and plain string literal both prune (4 disjoint files)
    assert(kept("d >= DATE'2024-04-20' AND d < DATE'2024-07-01'") == 1)
    assert(kept("d = '2024-01-05'") == 1)
    assert(kept("d > '2025-06-01'") == 0)
    // NTZ: typed literal, string literal, and a DATE literal cast
    assert(kept("tn >= TIMESTAMP_NTZ'2024-01-01 02:00:00' AND " +
      "tn < TIMESTAMP_NTZ'2024-01-01 03:00:00'") == 1)
    assert(kept("tn = '2024-01-01 01:00:00'") == 1)
    assert(kept("tn >= DATE'2024-01-02'") == 0)
    assert(kept("tn < '2024-01-01 00:00:01'") == 1)
    // LTZ (session is UTC): typed and string forms
    assert(kept("tl >= TIMESTAMP'2024-01-01 05:00:00Z'") == 1)
    assert(kept("tl < '2024-01-01 01:40:00'") == 1)
    // DECIMAL: exact boundary = on a file max keeps exactly that file
    assert(kept("dec = 24.75") == 1)
    assert(kept("dec > 99.75") == 0)
    assert(kept("dec >= 25.00 AND dec < 50.00") == 1)
    // soundness: pruned reads equal the unpruned filter, boundaries included
    for (p <- Seq(
      "d >= DATE'2024-04-09' AND d <= DATE'2024-04-10'",   // straddles files 1|2
      "tn = TIMESTAMP_NTZ'2024-01-01 01:39:00'",           // exact file max
      "tl >= '2024-01-01 01:39:00' AND tl <= '2024-01-01 01:40:00'",
      "dec = 25.00", "dec IN (0.25, 99.75)")) {
      val a = DeltaReader.readWhere(spark, dir, p).count()
      val b = DeltaReader.read(spark, dir).where(p).count()
      assert(a == b && b > 0, s"$p: pruned=$a unpruned=$b")
    }
  }

  test("temporal partition values prune typed (date partitions, the 100-TB layout)") {
    val dir = tmp("graft_stats_tpv_")
    val df = spark.range(90).selectExpr(
      "id", "date_add(DATE'2024-01-01', CAST(id / 30 AS INT)) AS day")
    LakeWriter.writeDelta(df, dir, partitionBy = Seq("day"))
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap)
      .map(_.partitionValues("day")).toSet
    assert(kept("day = DATE'2024-01-02'") == Set("2024-01-02"))
    assert(kept("day >= '2024-01-02'") == Set("2024-01-02", "2024-01-03"))
    assert(kept("day < DATE'2024-01-01'").isEmpty)
    assert(DeltaReader.readWhere(spark, dir, "day = '2024-01-02'").count() == 30L)
  }

  test("foreign millis-truncated timestamp bounds widen on max (never wrongly prune)") {
    // this writer emits micros-exact bounds; a foreign engine's
    // millis-truncated max under-reports by up to 999 µs
    assert(DeltaStats.parseTsBound("2024-01-01T00:00:00.123Z", widenMax = false)
      .contains(1704067200123000L))
    assert(DeltaStats.parseTsBound("2024-01-01T00:00:00.123Z", widenMax = true)
      .contains(1704067200123999L))
    assert(DeltaStats.parseTsBound("2024-01-01T00:00:00", widenMax = true)
      .contains(1704067200999999L))
    assert(DeltaStats.parseTsBound("2024-01-01T00:00:00.123456Z", widenMax = true)
      .contains(1704067200123456L))
    // offset forms resolve to the same instant
    assert(DeltaStats.parseTsBound("2024-01-01T01:00:00+01:00", widenMax = false) ==
      DeltaStats.parseTsBound("2024-01-01T00:00:00Z", widenMax = false))
    assert(DeltaStats.parseTsBound("not a time", widenMax = true).isEmpty)
  }

  test("LIKE prefix predicates prune on string bounds; truncation boundary stays may-match") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_stats_like_")
    // two files with disjoint URL-prefix envelopes — the corpus idiom
    LakeWriter.writeDelta(Seq(
      "https://a.example/x", "https://b.example/y").toDF("url").repartition(1)
      .sortWithinPartitions("url").coalesce(1), dir)
    LakeWriter.appendDelta(Seq(
      "https://m.example/1", "https://n.example/2").toDF("url").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    assert(kept("url LIKE 'https://a.%'") == 1)
    assert(kept("url LIKE 'https://m.%'") == 1)
    assert(kept("url LIKE 'https://z.%'") == 0)
    assert(kept("url LIKE 'https://%'") == 2)        // shared prefix
    assert(kept("url LIKE '%example%'") == 2)        // not a prefix → may-match
    assert(kept("url LIKE 'https://a._'") == 2)      // '_' wildcard → may-match
    assert(DeltaReader.readWhere(spark, dir, "url LIKE 'https://m.%'").count() == 1L)

    // truncation boundary: a 40-cp value truncates to a 32-cp stored
    // envelope [a^31 b, a^31 c); a prefix probing exactly the
    // incremented-max region must stay may-match (treating the
    // truncated max as exact would be unsound one value later)
    val dir2 = tmp("graft_stats_like_tr_")
    val long40 = "a" * 31 + "b" + "z" * 8
    LakeWriter.writeDelta(Seq(long40).toDF("v").coalesce(1), dir2)
    val snap2 = DeltaReader.snapshot(spark, dir2, None)
    def kept2(p: String) = DeltaStats.prune(spark, snap2.active, p, snap2).size
    assert(kept2(s"v LIKE '${"a" * 31}b%'") == 1, "true prefix must keep")
    assert(kept2(s"v LIKE '${"a" * 31}c%'") == 1,
      "the truncated max's region must stay may-match")
    assert(kept2(s"v LIKE '${"a" * 31}d%'") == 0, "above the widened envelope")
    assert(kept2("v LIKE 'b%'") == 0)
    assert(DeltaReader.readWhere(spark, dir2, s"v LIKE '${"a" * 31}b%'").count() == 1L)
  }

  test("NOT pushes through comparisons, IN and composition; NOT(=) prunes only constant files") {
    val dir = tmp("graft_stats_not_")
    rangedTable(dir)   // 4 files × 100 ids
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    assert(kept("NOT (id < 300)") == 1)
    assert(kept("NOT (id >= 100)") == 1)
    assert(kept("NOT (id < 100 OR id >= 200)") == 1)
    assert(kept("NOT (id >= 100 AND id < 300)") == 2)
    assert(kept("NOT NOT (id < 100)") == 1)
    assert(kept("NOT (id IS NULL)") == 4)
    // a constant-value file prunes under NOT(=); a mixed file never does
    val s = spark
    import s.implicits._
    val dirC = tmp("graft_stats_notc_")
    LakeWriter.writeDelta(Seq(7L, 7L, 7L).toDF("k").coalesce(1), dirC)
    LakeWriter.appendDelta(Seq(7L, 8L).toDF("k").coalesce(1), dirC)
    val snapC = DeltaReader.snapshot(spark, dirC, None)
    val keptC = DeltaStats.prune(spark, snapC.active, "NOT (k = 7)", snapC)
    assert(keptC.size == 1)
    assert(DeltaReader.readWhere(spark, dirC, "NOT (k = 7)").count() == 1L)
    assert(DeltaStats.prune(spark, snapC.active, "k != 7", snapC).size == 1)
    assert(DeltaStats.prune(spark, snapC.active, "NOT (k IN (7, 8))", snapC).size == 1)
    assert(DeltaStats.prune(spark, snapC.active, "NOT (k IN (7))", snapC).size == 1)
  }

  test("struct leaves get nested stats (delta-spark's shape) and prune on dotted paths") {
    val dir = tmp("graft_stats_nested_")
    val df = spark.range(400).selectExpr(
      "id",
      "named_struct('x', id * 2, 'tag', concat('t', lpad(CAST(id AS STRING), 4, '0')), " +
        "'inner', named_struct('y', CAST(id AS DOUBLE))) AS s",
      "array(id) AS arr",
      "map('k', id) AS m")
    LakeWriter.writeDelta(
      df.repartitionByRange(4, org.apache.spark.sql.functions.col("id")), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val first = snap.active.map(a => om.readTree(a.stats.get))
      .minBy(_.get("minValues").get("id").asLong())
    // nested objects, not flat dotted keys
    assert(first.get("minValues").get("s").get("x").asLong() == 0L, first.toString)
    assert(first.get("maxValues").get("s").get("x").asLong() == 198L)
    assert(first.get("maxValues").get("s").get("tag").asText() == "t0099")
    assert(first.get("minValues").get("s").get("inner").get("y").asDouble() == 0.0)
    assert(first.get("nullCount").get("s").get("x").asLong() == 0L)
    // list/map internals carry no row-envelope stats
    assert(!first.get("minValues").has("arr") && !first.get("minValues").has("m"),
      first.toString)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    assert(kept("s.x >= 220 AND s.x < 380") == 1)
    assert(kept("s.x > 10000") == 0)
    assert(kept("s.tag LIKE 't03%'") == 1)
    assert(kept("s.inner.y < 100.0") == 1)
    assert(kept("s.inner.y IS NULL") == 0)
    // pruned ≡ unpruned, and the checkpoint round-trip keeps pruning
    assert(DeltaReader.readWhere(spark, dir, "s.x >= 220 AND s.x < 380").count() ==
      DeltaReader.read(spark, dir).where("s.x >= 220 AND s.x < 380").count())
    LakeWriter.checkpointDelta(spark, dir, 0L)
    assert(new java.io.File(dir, "_delta_log/" + "0" * 20 + ".json").delete())
    val replayed = DeltaReader.snapshot(spark, dir, None)
    assert(DeltaStats.prune(spark, replayed.active, "s.x > 10000", replayed).isEmpty)

    // the leaf CAP counts depth-first leaves: numIndexedCols=2 indexes
    // id and s.x only
    val dir2 = tmp("graft_stats_nested_cap_")
    LakeWriter.writeDelta(df.coalesce(1), dir2,
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "2"))
    val n2 = om.readTree(DeltaReader.snapshot(spark, dir2, None).active.head.stats.get)
    assert(n2.get("minValues").has("id") && n2.get("minValues").get("s").has("x"))
    assert(!n2.get("minValues").get("s").has("tag"), n2.toString)
    // an explicit statsColumns list naming the STRUCT indexes all its leaves
    val dir3 = tmp("graft_stats_nested_cols_")
    LakeWriter.writeDelta(df.coalesce(1), dir3,
      configuration = Map("delta.dataSkippingStatsColumns" -> "s"))
    val n3 = om.readTree(DeltaReader.snapshot(spark, dir3, None).active.head.stats.get)
    assert(!n3.get("minValues").has("id"))
    assert(n3.get("minValues").get("s").has("tag") &&
      n3.get("minValues").get("s").get("inner").has("y"), n3.toString)
  }

  test("stats_parsed interop: a struct-only checkpoint (writeStatsAsJson=false) still prunes after replay") {
    val dir = tmp("graft_stats_parsed_")
    val df = spark.range(400).selectExpr(
      "id",
      "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS tn",
      "concat('v', lpad(CAST(id AS STRING), 4, '0')) AS v",
      "named_struct('x', id * 2) AS s")
    LakeWriter.writeDelta(
      df.repartitionByRange(4, org.apache.spark.sql.functions.col("id")), dir,
      configuration = Map(
        "delta.checkpoint.writeStatsAsStruct" -> "true",
        "delta.checkpoint.writeStatsAsJson" -> "false"))
    LakeWriter.checkpointDelta(spark, dir, 0L)
    // the checkpoint parquet carries ONLY the struct form
    val cpFile = new java.io.File(dir, "_delta_log")
      .listFiles().filter(_.getName.endsWith(".checkpoint.parquet")).head
    val cp = spark.read.parquet(cpFile.getPath).where("add IS NOT NULL")
    assert(cp.schema("add").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("stats_parsed"))
    assert(cp.where("add.stats IS NOT NULL").count() == 0L, "JSON form must be absent")
    assert(cp.where("add.stats_parsed.numRecords = 100").count() == 4L)
    // force replay THROUGH the checkpoint: the commit json goes away
    assert(new java.io.File(dir, "_delta_log/" + "0" * 20 + ".json").delete())
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.forall(_.stats.isDefined),
      "stats_parsed must synthesize the JSON form on read")
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    assert(kept("id >= 110 AND id < 160") == 1)
    assert(kept("tn >= TIMESTAMP_NTZ'2024-01-01 02:00:00' AND " +
      "tn < TIMESTAMP_NTZ'2024-01-01 03:00:00'") == 1)
    assert(kept("v LIKE 'v03%'") == 1)
    assert(kept("s.x > 10000") == 0)
    assert(kept("id > 10000") == 0)
    // and the pruned read stays exact
    assert(DeltaReader.readWhere(spark, dir,
      "tn >= TIMESTAMP_NTZ'2024-01-01 02:00:00'").count() == 280L)

    // the V2 author honors the same properties: a struct-only v2
    // checkpoint (manifest + sidecars) replays and still prunes
    val d2 = tmp("graft_stats_parsed_v2_")
    LakeWriter.writeDelta(
      df.repartitionByRange(4, org.apache.spark.sql.functions.col("id")), d2,
      configuration = Map(
        "delta.checkpoint.writeStatsAsStruct" -> "true",
        "delta.checkpoint.writeStatsAsJson" -> "false"))
    LakeWriter.checkpointDeltaV2(spark, d2, 0L)
    assert(new java.io.File(d2, "_delta_log/" + "0" * 20 + ".json").delete())
    val snap2 = DeltaReader.snapshot(spark, d2, None)
    assert(snap2.active.forall(_.stats.isDefined))
    assert(DeltaStats.prune(spark, snap2.active, "id >= 110 AND id < 160", snap2).size == 1)
    assert(DeltaReader.readWhere(spark, d2, "v LIKE 'v03%'").count() == 100L)
  }

  test("an offset-suffixed string literal against an NTZ column keeps the wall clock (Spark's cast rule) — never shifts and wrongly prunes") {
    val dir = tmp("graft_stats_ntzoff_")
    typedTable(dir)   // tn starts at wall clock 2024-01-01T00:00
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    // Spark casts '....+05:00' to NTZ by IGNORING the offset: the
    // predicate matches the 00:00 wall-clock row, so file 1 must stay
    assert(kept("tn = '2024-01-01 00:00:00+05:00'") == 1)
    val p = "tn = '2024-01-01 00:00:00+05:00'"
    val pruned = DeltaReader.readWhere(spark, dir, p).count()
    val full = DeltaReader.read(spark, dir).where(p).count()
    assert(pruned == full && full == 1L, s"pruned=$pruned full=$full")
    // and the LTZ column HONORS the offset (cast semantics differ)
    assert(kept("tl = '2024-01-01 05:00:00+05:00'") == 1)
    assert(DeltaReader.readWhere(spark, dir,
      "tl = '2024-01-01 05:00:00+05:00'").count() == 1L)
  }

  test("stats_parsed on a column-mapped table keys the struct by PHYSICAL names; logical predicates still prune after replay") {
    val dir = tmp("graft_stats_parsed_cm_")
    val df = spark.range(200).selectExpr("id AS k",
      "concat('v', lpad(CAST(id AS STRING), 4, '0')) AS v")
    LakeWriter.writeDeltaMapped(
      df.repartitionByRange(2, org.apache.spark.sql.functions.col("k")), dir)
    LakeWriter.alterProperties(spark, dir, Map(
      "delta.checkpoint.writeStatsAsStruct" -> "true",
      "delta.checkpoint.writeStatsAsJson" -> "false"))
    LakeWriter.checkpointDelta(spark, dir, 1L)
    // the struct is keyed by the files' physical names, bounds non-null
    val cpFile = new java.io.File(dir, "_delta_log")
      .listFiles().filter(_.getName.endsWith(".checkpoint.parquet")).head
    val cp = spark.read.parquet(cpFile.getPath).where("add IS NOT NULL")
    val spT = cp.schema("add").dataType.asInstanceOf[org.apache.spark.sql.types.StructType](
      "stats_parsed").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val minT = spT("minValues").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(minT.fieldNames.forall(_.startsWith("col-")), minT.fieldNames.mkString(","))
    assert(cp.where("add.stats_parsed.numRecords IS NULL").count() == 0L)
    // replay THROUGH the struct-only checkpoint: logical predicates prune
    (0L to 1L).foreach { v =>
      assert(new java.io.File(dir, "_delta_log/" + f"$v%020d.json").delete())
    }
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.forall(_.stats.isDefined))
    assert(DeltaStats.prune(spark, snap.active, "k > 10000", snap).isEmpty)
    assert(DeltaStats.prune(spark, snap.active, "k >= 0 AND k < 100", snap).size == 1)
    assert(DeltaReader.readWhere(spark, dir, "v LIKE 'v003%'").count() == 10L)
  }

  test("id-mode column mapping prunes: stats keys remap through physicalName metadata like name mode") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_idmode_").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    // two parquet files in the physical names, field ids attached
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    def fileOf(name: String, lo: Long): Unit = {
      val fileSchema = StructType(Seq(
        StructField("pa", LongType, nullable = true, new MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()),
        StructField("pb", StringType, nullable = true, new MetadataBuilder()
          .putLong("parquet.field.id", 2L).build())))
      val stage = new java.io.File(dir, s"_stage_$name")
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          (lo until lo + 10).map(i => org.apache.spark.sql.Row(i, s"v$i")), 1),
        fileSchema).coalesce(1).write.parquet(stage.getPath)
      val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(pf.toPath, new java.io.File(dir, name).toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    fileOf("f-low.parquet", 0L)
    fileOf("f-high.parquet", 1000L)
    def fld(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      fld("id", LongType, "pa", 1), fld("v", StringType, "pb", 2)))
    def stats(lo: Long): String = om.writeValueAsString(
      s"""{"numRecords":10,"minValues":{"pa":$lo,"pb":"v$lo"},""" +
        s""""maxValues":{"pa":${lo + 9},"pb":"v${lo + 9}"},""" +
        s""""nullCount":{"pa":0,"pb":0}}""")
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"idm","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"}}}""",
      s"""{"add":{"path":"f-low.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${stats(0L)}}}""",
      s"""{"add":{"path":"f-high.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${stats(1000L)}}}"""
    ).mkString("\n").getBytes("UTF-8"))
    val snap = DeltaReader.snapshot(spark, dir.getPath, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    // before the fix every predicate on an id-mode table answered
    // may-match (keys never remapped): these pins prove files SKIP
    assert(kept("id >= 1000") == 1)
    assert(kept("id > 5000") == 0)
    assert(kept("v = 'v3'") == 1)
    // pruned ≡ unpruned
    assert(DeltaReader.readWhere(spark, dir.getPath, "id >= 1000").count() ==
      DeltaReader.read(spark, dir.getPath).where("id >= 1000").count())
    assert(DeltaReader.readWhere(spark, dir.getPath, "id >= 1000").count() == 10L)
  }

  test("foreign nested physical names (per-level) prune their struct leaves and read correctly") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_nestphys_").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    val om = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    // files carry PHYSICAL names at every level: p_s { p_x, p_tag }
    def fileOf(name: String, lo: Long): Unit = {
      val stage = new java.io.File(dir, s"_stage_$name")
      spark.range(lo, lo + 10).selectExpr(
        "id AS c_id", "named_struct('p_x', id * 2, 'p_tag', concat('t', id)) AS p_s")
        .coalesce(1).write.parquet(stage.getPath)
      val pf = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(pf.toPath, new java.io.File(dir, name).toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    fileOf("n-low.parquet", 0L)
    fileOf("n-high.parquet", 500L)
    def pf(n: String, t: DataType, phys: String, id: Long) =
      StructField(n, t, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build())
    val logical = StructType(Seq(
      pf("id", LongType, "c_id", 1),
      pf("s", StructType(Seq(
        pf("x", LongType, "p_x", 3), pf("tag", StringType, "p_tag", 4))), "p_s", 2)))
    def stats(lo: Long): String = om.writeValueAsString(
      s"""{"numRecords":10,"minValues":{"c_id":$lo,"p_s":{"p_x":${lo * 2},"p_tag":"t$lo"}},""" +
        s""""maxValues":{"c_id":${lo + 9},"p_s":{"p_x":${(lo + 9) * 2},"p_tag":"t${lo + 9}"}},""" +
        s""""nullCount":{"c_id":0,"p_s":{"p_x":0,"p_tag":0}}}""")
    java.nio.file.Files.write(new java.io.File(log, "0" * 20 + ".json").toPath, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"nph","format":{"provider":"parquet","options":{}},"schemaString":${
        om.writeValueAsString(logical.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"4"}}}""",
      s"""{"add":{"path":"n-low.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${stats(0L)}}}""",
      s"""{"add":{"path":"n-high.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"stats":${stats(500L)}}}"""
    ).mkString("\n").getBytes("UTF-8"))
    val snap = DeltaReader.snapshot(spark, dir.getPath, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    // per-level remap: the dotted physical key p_s.p_x lands on s.x
    assert(kept("s.x >= 1000") == 1)
    assert(kept("s.x > 100000") == 0)
    assert(kept("s.tag = 't3'") == 1)
    // the read itself resolves nested physical names (not null-fill):
    // values AND pruned ≡ unpruned
    val got = DeltaReader.read(spark, dir.getPath)
      .selectExpr("id", "s.x", "s.tag").where("id = 502").collect()
    assert(got.length == 1 && got(0).getLong(1) == 1004L &&
      got(0).getString(2) == "t502", got.mkString(","))
    assert(DeltaReader.readWhere(spark, dir.getPath, "s.x >= 1000").count() ==
      DeltaReader.read(spark, dir.getPath).where("s.x >= 1000").count())
    assert(DeltaReader.readWhere(spark, dir.getPath, "s.x >= 1000").count() == 10L)
    // WRITES to the per-level table stage physical nested names too —
    // the read schema above resolves them, so a graft-written file
    // must carry the same shape or its struct leaves would null-fill
    LakeWriter.appendDelta(spark.range(900, 902).selectExpr(
      "id", "named_struct('x', id * 2, 'tag', concat('t', id)) AS s").coalesce(1),
      dir.getPath)
    val back = DeltaReader.read(spark, dir.getPath)
      .selectExpr("id", "s.x", "s.tag").where("id = 901").collect()
    assert(back.length == 1 && back(0).getLong(1) == 1802L &&
      back(0).getString(2) == "t901", back.mkString(","))
    val snap2 = DeltaReader.snapshot(spark, dir.getPath, None)
    val newAdd = snap2.active.find(_.path.startsWith("part-0")).get
    val om2 = new com.fasterxml.jackson.databind.ObjectMapper()
    val mv2 = om2.readTree(newAdd.stats.get).get("minValues")
    assert(mv2.get("p_s").has("p_x"), mv2.toString)
    assert(DeltaStats.prune(spark, snap2.active, "s.x >= 1800", snap2)
      .map(_.path) == Seq(newAdd.path))
  }

  test("dataSkippingStatsColumns on a column-mapped table collects the listed columns (logical→physical)") {
    val dir = tmp("graft_stats_cmcols_")
    val df = spark.range(100).selectExpr("id AS k",
      "concat('v', lpad(CAST(id AS STRING), 4, '0')) AS v")
    LakeWriter.writeDeltaMapped(df.coalesce(1), dir)
    LakeWriter.alterProperties(spark, dir, Map(
      "delta.dataSkippingStatsColumns" -> "v"))
    LakeWriter.appendDelta(
      spark.range(100, 200).selectExpr("id AS k",
        "concat('v', lpad(CAST(id AS STRING), 4, '0')) AS v").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val physV = schema("v").metadata.getString("delta.columnMapping.physicalName")
    val physK = schema("k").metadata.getString("delta.columnMapping.physicalName")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // the appended file (written AFTER statsColumns was set) carries
    // the LISTED column under its physical key and NOT the unlisted
    // one — before the fix the logical name matched no footer path and
    // the column the user explicitly configured collected NO stats
    val appended = snap.active.filter(a => a.stats.exists { st =>
      val mv = om.readTree(st).get("minValues")
      mv != null && mv.has(physV) && !mv.has(physK)
    })
    assert(appended.size == 1, snap.active.map(_.stats).mkString("\n"))
    assert(DeltaReader.readWhere(spark, dir, "v = 'v0150'").count() == 1L)
  }

  test("generated date partitions derive partition filters from source-column predicates") {
    import org.apache.spark.sql.types._
    val dir = tmp("graft_stats_genpart_")
    // p DATE GENERATED ALWAYS AS (CAST(ts AS DATE)), partitioned by p:
    // 4 days of hourly NTZ timestamps -> 4 partitions
    val genMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "CAST(ts AS DATE)").build()
    val base = spark.range(96).selectExpr(
      "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts",
      "id AS n", "CAST(CAST(timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS DATE) AS DATE) AS p")
    val df = spark.createDataFrame(base.rdd, StructType(base.schema.fields.map {
      case f if f.name == "p" => f.copy(metadata = genMeta)
      case f => f
    }))
    LakeWriter.writeDelta(df, dir, partitionBy = Seq("p"))
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.map(_.partitionValues("p")).distinct.size == 4)
    // the ts-only predicate prunes to the SAME file set an explicitly
    // derived partition filter would (the r14 redundancy claim, now a
    // checkable pin rather than a comment)
    val byTs = DeltaStats.prune(spark, snap.active,
      "ts >= timestamp_ntz'2024-01-03 00:00:00'", snap).map(_.path).toSet
    val byPart = DeltaStats.prune(spark, snap.active,
      "p >= date'2024-01-03'", snap).map(_.path).toSet
    assert(byTs == byPart && byTs.size < snap.active.size, s"$byTs vs $byPart")
    // the case stats CANNOT cover: strip stats (a foreign add without
    // them) — the derived partition conjunct still prunes
    val statless = snap.active.map(_.copy(stats = None))
    val derivedOnly = DeltaStats.prune(spark, statless,
      "ts >= timestamp_ntz'2024-01-03 00:00:00'", snap).map(_.path).toSet
    assert(derivedOnly == byPart, s"derived=$derivedOnly part=$byPart")
    // equality with IN and the = shape; under OR nothing derives (sound)
    assert(DeltaStats.prune(spark, statless,
      "ts = timestamp_ntz'2024-01-02 05:00:00'", snap)
      .map(_.partitionValues("p")).toSet == Set("2024-01-02"))
    assert(DeltaStats.prune(spark, statless,
      "ts = timestamp_ntz'2024-01-02 05:00:00' OR n = 0", snap).size ==
      statless.size)
    // pruned read ≡ unpruned read
    assert(DeltaReader.readWhere(spark, dir,
      "ts >= timestamp_ntz'2024-01-03 00:00:00'").count() ==
      DeltaReader.read(spark, dir)
        .where("ts >= timestamp_ntz'2024-01-03 00:00:00'").count())
    // date_trunc shape: month partitions over an NTZ source
    val dir2 = tmp("graft_stats_genpart_m_")
    val gm2 = new MetadataBuilder()
      .putString("delta.generationExpression", "date_trunc('MONTH', ts)").build()
    val b2 = spark.range(90).selectExpr(
      "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts",
      "date_trunc('MONTH', timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0)) AS pm")
    val df2 = spark.createDataFrame(b2.rdd, StructType(b2.schema.fields.map {
      case f if f.name == "pm" => f.copy(metadata = gm2)
      case f => f
    }))
    LakeWriter.writeDelta(df2, dir2, partitionBy = Seq("pm"))
    val snap2 = DeltaReader.snapshot(spark, dir2, None)
    val sl2 = snap2.active.map(_.copy(stats = None))
    val kept2 = DeltaStats.prune(spark, sl2,
      "ts > timestamp_ntz'2024-03-02 00:00:00'", snap2)
    assert(kept2.map(_.partitionValues("pm")).forall(_.startsWith("2024-03")),
      kept2.map(_.partitionValues("pm")).mkString(","))
    assert(DeltaReader.readWhere(spark, dir2,
      "ts > timestamp_ntz'2024-03-02 00:00:00'").count() ==
      DeltaReader.read(spark, dir2)
        .where("ts > timestamp_ntz'2024-03-02 00:00:00'").count())
  }

  test("a decimal beyond double precision prunes exactly (BigDecimal path, no lossy round-trip)") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_stats_bigdec_")
    // 2^53+1 is not representable as a double; the two values straddle it
    LakeWriter.writeDelta(
      Seq("9007199254740993.01", "9007199254740993.03")
        .toDF("raw").selectExpr("CAST(raw AS DECIMAL(38,2)) AS x").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    def kept(p: String) = DeltaStats.prune(spark, snap.active, p, snap).size
    // bare decimal literals (a CAST is not a Literal — it would
    // legitimately fall to may-match)
    assert(kept("x = 9007199254740993.02") == 1)
    assert(kept("x > 9007199254740993.03") == 0)
    assert(kept("x < 9007199254740993.01") == 0)
  }
}
