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
}
