package graft

import graft.sources.{DeltaReader, DeltaStats, LakeWriter}
import org.apache.spark.sql.functions._

/** Wide-table stats economics (`delta.dataSkippingNumIndexedCols`,
  * delta-spark's knob) and OPTIMIZE's stats preservation: add.stats
  * JSON rides in every commit/checkpoint/resolve, so wide tables cap
  * the indexed column prefix — and a compaction rewrite must re-emit
  * stats or it silently destroys data skipping on the files it folds.
  */
class DeltaStatsCapSpec extends SparkSpec {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def wide(n: Int) = {
    val cols = (0 until n).map(i => expr(s"id * ${i + 1}").as(s"c$i"))
    spark.range(0, 100).select(cols: _*).coalesce(1)
  }

  private def minCols(dir: String): Set[String] = {
    val a = DeltaReader.snapshot(spark, dir, None).active.head
    val mv = om.readTree(a.stats.get).get("minValues")
    val it = mv.fieldNames(); val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  test("stats index the first 32 columns by default; the property tightens or lifts the cap") {
    val d32 = tmp("graft_statscap_d_")
    LakeWriter.writeDelta(wide(40), d32)
    val defCols = minCols(d32)
    assert(defCols.size == 32 && defCols.contains("c0") && defCols.contains("c31") &&
      !defCols.contains("c32"), defCols.toSeq.sorted.mkString(", "))

    val d8 = tmp("graft_statscap_8_")
    LakeWriter.writeDelta(wide(40), d8,
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "8"))
    assert(minCols(d8) == (0 until 8).map(i => s"c$i").toSet)

    val dAll = tmp("graft_statscap_all_")
    LakeWriter.writeDelta(wide(40), dAll,
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "-1"))
    assert(minCols(dAll).size == 40)

    // numRecords always present; a predicate on an UNINDEXED column
    // still answers exactly (missing stats read as may-match)
    val a = DeltaReader.snapshot(spark, d8, None).active.head
    assert(om.readTree(a.stats.get).get("numRecords").asLong() == 100L)
    assert(DeltaReader.readWhere(spark, d8, "c35 = 360").count() ==
      DeltaReader.read(spark, d8).where("c35 = 360").count())
  }

  test("an identity column beyond the cap still gets stats (watermark advance survives)") {
    import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType, StructField, StructType}
    import graft.sources.IdentityColumns
    val dir = tmp("graft_statscap_id_")
    // 40 payload columns, the identity column LAST — position 41, far
    // past the default 32-column stats prefix
    val fields = (0 until 40).map(i => StructField(s"c$i", StringType)) :+
      StructField("rid", LongType, nullable = true, new MetadataBuilder()
        .putLong(IdentityColumns.StartKey, 1L)
        .putLong(IdentityColumns.StepKey, 1L)
        .putBoolean(IdentityColumns.ExplicitKey, false).build())
    LakeWriter.writeDelta(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields)), dir)
    val batch = spark.range(0, 10).select(
      (0 until 40).map(i => expr(s"concat('v', id * $i)").as(s"c$i")): _*)
    LakeWriter.appendDelta(batch, dir)
    LakeWriter.appendDelta(batch, dir) // would refuse if the cap ate the rid bounds
    val s2 = spark
    import s2.implicits._
    val rids = DeltaReader.read(spark, dir).select("rid").as[Long].collect()
    assert(rids.length == 20 && rids.distinct.length == 20, "duplicate identity values")
    // skip the creating commit's empty file — assert on a data add
    val a = DeltaReader.snapshot(spark, dir, None).active
      .find(x => om.readTree(x.stats.get).get("numRecords").asLong() > 0L).get
    val mv = om.readTree(a.stats.get).get("minValues")
    assert(mv.has("rid"), "identity column bounds must ride over the stats cap")
    assert(!mv.has("c35"), "the cap still applies to ordinary columns")
  }

  test("delta.dataSkippingStatsColumns replaces the prefix rule with an explicit list") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_statscap_cols_")
    // the columns people filter on sit far past the 32-column prefix —
    // the explicit list indexes exactly them and nothing else
    LakeWriter.writeDelta(wide(40), dir,
      configuration = Map("delta.dataSkippingStatsColumns" -> "c35, c5"))
    assert(minCols(dir) == Set("c5", "c35"), minCols(dir).toSeq.sorted.mkString(", "))
    // appends inherit the list from the table configuration
    LakeWriter.appendDelta(wide(40), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    snap.active.foreach { a =>
      val mv = om.readTree(a.stats.get).get("minValues")
      assert(mv.has("c35") && !mv.has("c0"), a.path)
    }
    // skipping answers exactly on listed AND unlisted columns
    Seq("c35 = 360", "c0 = 50").foreach { p =>
      assert(DeltaReader.readWhere(spark, dir, p).count() ==
        DeltaReader.read(spark, dir).where(p).count(), p)
    }
    // identity columns still ride over an explicit list that omits them
    import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType, StructField, StructType}
    import graft.sources.IdentityColumns
    val dir2 = tmp("graft_statscap_cols_id_")
    val fields = (0 until 4).map(i => StructField(s"c$i", StringType)) :+
      StructField("rid", LongType, nullable = true, new MetadataBuilder()
        .putLong(IdentityColumns.StartKey, 1L)
        .putLong(IdentityColumns.StepKey, 1L)
        .putBoolean(IdentityColumns.ExplicitKey, false).build())
    LakeWriter.writeDelta(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields)), dir2,
      configuration = Map("delta.dataSkippingStatsColumns" -> "c1"))
    val batch = spark.range(0, 5).select(
      (0 until 4).map(i => expr(s"concat('v', id * $i)").as(s"c$i")): _*)
    LakeWriter.appendDelta(batch, dir2)
    LakeWriter.appendDelta(batch, dir2) // would refuse if the list ate rid bounds
    val rids = DeltaReader.read(spark, dir2).select("rid").as[Long].collect()
    assert(rids.length == 10 && rids.distinct.length == 10)
  }

  test("delta.dataSkippingStatsColumns naming an unknown column refuses at CREATE and ALTER") {
    val d = tmp("graft_statscap_v_")
    val e = intercept[Exception] {
      LakeWriter.writeDelta(wide(4), d,
        configuration = Map("delta.dataSkippingStatsColumns" -> "c1, cXX"))
    }
    assert(e.getMessage.contains("cXX"), e.getMessage)
    LakeWriter.writeDelta(wide(4), d,
      configuration = Map("delta.dataSkippingStatsColumns" -> "c1,c3"))
    assert(minCols(d) == Set("c1", "c3"))
    val e2 = intercept[Exception] {
      LakeWriter.alterProperties(spark, d,
        Map("delta.dataSkippingStatsColumns" -> "c2,nope"))
    }
    assert(e2.getMessage.contains("nope"), e2.getMessage)
    LakeWriter.alterProperties(spark, d,
      Map("delta.dataSkippingStatsColumns" -> "c2"))
  }

  test("applyCdcDv on a wide identity table: watermark bounds survive the stats cap") {
    import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType, StructField, StructType}
    import graft.sources.IdentityColumns
    val dir = tmp("graft_statscap_cdc_")
    val fields = (0 until 40).map(i => StructField(s"c$i", StringType)) :+
      StructField("rid", LongType, nullable = true, new MetadataBuilder()
        .putLong(IdentityColumns.StartKey, 1L)
        .putLong(IdentityColumns.StepKey, 1L)
        .putBoolean(IdentityColumns.ExplicitKey, false).build())
    LakeWriter.writeDelta(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields)), dir)
    // the CDC-replication path stages its own adds (applyCdcDv, not
    // commitDelta's append) — its stats must ALSO carry the identity
    // column over the 32-column cap or newWatermarks refuses the commit
    val changes = spark.range(0, 5).select(
      ((0 until 40).map(i => expr(s"concat('n', id * ${i + 1})").as(s"c$i")) :+
        (col("id") + 100L).as("rid") :+
        expr("'insert'").as("_change_type")): _*)
    LakeWriter.applyCdcDv(spark, dir, changes, Seq("c0"))
    // the watermark advanced past the replicated ids: a direct append
    // after replication must mint FRESH ids, never re-mint 100..104
    LakeWriter.appendDelta(spark.range(0, 5).select(
      (0 until 40).map(i => expr(s"concat('v', id * ${i + 1})").as(s"c$i")): _*), dir)
    val s2 = spark
    import s2.implicits._
    val rids = DeltaReader.read(spark, dir).select("rid").as[Long].collect()
    assert(rids.length == 10 && rids.distinct.length == 10,
      s"duplicate identity values: ${rids.sorted.mkString(", ")}")
    assert(rids.count(_ > 104L) == 5, rids.sorted.mkString(", "))
  }

  test("OPTIMIZE re-emits footer stats on compacted files; skipping still prunes") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_statscap_opt_")
    LakeWriter.writeDelta(spark.range(0, 100).toDF("id")
      .repartitionByRange(2, col("id")), dir)
    LakeWriter.appendDelta(spark.range(100, 400).toDF("id")
      .repartitionByRange(6, col("id")), dir)
    LakeWriter.compactDelta(spark, dir, minFiles = 2, targetFileBytes = 2000L)
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.size > 1 && snap.active.size < 8,
      s"expected a multi-bin fold, got ${snap.active.size} files")
    snap.active.foreach { a =>
      assert(a.stats.isDefined, s"compacted add ${a.path} lost its stats")
      val n = om.readTree(a.stats.get)
      assert(n.get("minValues").has("id") && n.get("numRecords").asLong() > 0L)
    }
    // pruning on the compacted layout: a point predicate reads fewer
    // files than the table holds, and exactly the right rows
    val hit = DeltaReader.readWhere(spark, dir, "id = 250")
    assert(hit.as[Long].collect().toSeq == Seq(250L))
    assert(hit.inputFiles.length < snap.active.size,
      s"no pruning: ${hit.inputFiles.length} of ${snap.active.size} files read")
  }

  test("code-point helpers: ordering, prefix, increment-after-truncate") {
    val astral = new String(Character.toChars(0x10000)) // U+10000 "𐀀"
    // UTF-16 code units sort U+FFFF ABOVE supplementary characters;
    // code-point order (= UTF-8 byte order = Spark's UTF8String order)
    // sorts it below — the whole reason compareTo can't prune
    assert("￿".compareTo(astral) > 0)
    assert(DeltaStats.codePointCompare("￿", astral) < 0)
    assert(DeltaStats.codePointCompare("ab", "ab") == 0)
    assert(DeltaStats.codePointCompare("ab", "abc") < 0)
    // prefix counts CODE POINTS, not chars (an astral cp is 2 chars)
    val emoji = new String(Character.toChars(0x1F600))
    assert(DeltaStats.prefixCodePoints(emoji * 40, 32) == emoji * 32)
    assert(DeltaStats.prefixCodePoints("short", 32) == "short")
    // a string that fits is its own upper bound
    assert(DeltaStats.truncateMaxString("ab", 32).contains("ab"))
    // plain increment of the last kept code point, tail dropped
    assert(DeltaStats.truncateMaxString("ab" + "z" * 40, 3).contains("ab{"))
    // incrementing U+D7FF must skip the surrogate gap to U+E000
    assert(DeltaStats.truncateMaxString("a퟿XYZ", 2).contains("a"))
    // an unincrementable tail carries into the previous code point
    val maxCp = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(DeltaStats.truncateMaxString("a" + maxCp + "tail", 2).contains("b"))
    // all prefix code points at U+10FFFF: no finite bound at this length
    assert(DeltaStats.truncateMaxString(maxCp * 3 + "tail", 3).isEmpty)
  }

  test("non-ASCII string skipping: CJK / accents / astral prune and never false-negative") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_statscap_utf8_")
    val astral1 = new String(Character.toChars(0x10400)) + "x"
    val astral2 = new String(Character.toChars(0x1F600))
    // four single-file appends with disjoint code-point ranges:
    // ASCII < accents < CJK < astral
    val groups = Seq(
      Seq("apple", "berry"),
      Seq("café", "naïve"),
      Seq("中文", "漢字"),
      Seq(astral1, astral2))
    LakeWriter.writeDelta(groups.head.toDF("s").coalesce(1), dir)
    groups.tail.foreach(g => LakeWriter.appendDelta(g.toDF("s").coalesce(1), dir))
    val snap = DeltaReader.snapshot(spark, dir, None)
    assert(snap.active.size == 4)
    snap.active.foreach { a =>
      val n = om.readTree(a.stats.get)
      assert(n.get("minValues").has("s") && n.get("maxValues").has("s"),
        s"string bounds missing on ${a.path}")
    }
    // point predicates keep exactly the one file whose envelope matches
    assert(DeltaStats.prune(spark, snap.active, "s = '中文'", snap).size == 1)
    assert(DeltaStats.prune(spark, snap.active, "s = 'naïve'", snap).size == 1)
    // the astral boundary: only the astral file holds values above
    // U+FFFF — compareTo ordering would have pruned it (false negative)
    val above = DeltaStats.prune(spark, snap.active, "s > '￿'", snap)
    assert(above.size == 1, above.map(_.path).mkString(", "))
    // no false negatives: readWhere ≡ read().where on boundary predicates
    Seq(s"s = 'café'", "s > '￿'", "s >= '一'", "s < 'é'",
        s"s = '$astral2'").foreach { p =>
      val pruned = DeltaReader.readWhere(spark, dir, p).as[String].collect().sorted.toSeq
      val full = DeltaReader.read(spark, dir).where(p).as[String].collect().sorted.toSeq
      assert(pruned == full, s"$p: $pruned vs $full")
    }
  }

  test("string bounds truncate at 32 code points; pruner stays sound at the boundary") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_statscap_trunc_")
    val base = "中" * 32
    LakeWriter.writeDelta(Seq(base + "aaa", base + "zzz").toDF("s").coalesce(1), dir)
    val snap = DeltaReader.snapshot(spark, dir, None)
    val n = om.readTree(snap.active.head.stats.get)
    // min: the 32-cp prefix; max: prefix with last code point bumped
    assert(n.get("minValues").get("s").asText() == base)
    assert(n.get("maxValues").get("s").asText() == "中" * 31 + "丮")
    // inside the widened envelope: may-match, file read, rows exact
    assert(DeltaStats.prune(spark, snap.active, s"s = '${base}mmm'", snap).size == 1)
    // clearly outside: pruned, and the unpruned read agrees (0 rows)
    assert(DeltaStats.prune(spark, snap.active, "s = '香'", snap).isEmpty)
    Seq(s"s = '${base}zzz'", s"s = '${base}mmm'", "s = '香'").foreach { p =>
      assert(DeltaReader.readWhere(spark, dir, p).count() ==
        DeltaReader.read(spark, dir).where(p).count(), p)
    }
  }
}
