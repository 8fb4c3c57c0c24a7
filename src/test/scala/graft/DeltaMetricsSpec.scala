package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.functions._

/** commitInfo `operationMetrics` — delta-spark's DESCRIBE HISTORY
  * observability surface, derived centrally on the commit funnel from
  * the commit's own file actions (values as strings, the wire shape
  * delta-spark writes): numAddedFiles/numAddedBytes, numRemovedFiles,
  * numCdcFiles/numCdcBytes, and numOutputRows whenever every add
  * carries footer stats. Metadata-only commits carry none.
  */
class DeltaMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_metrics_$tag").resolve("t")
      .toAbsolutePath.toString

  private def metricsAt(dir: String, v: Long): Map[String, String] =
    DeltaReader.history(spark, dir)
      .where(col("version") === v)
      .select(col("operationMetrics"))
      .as[Map[String, String]].head()

  test("create, append, delete, compaction and metadata commits meter correctly") {
    val dir = tmp("battery")
    LakeWriter.writeDelta(spark.range(10).toDF("k").repartition(2), dir)
    val m0 = metricsAt(dir, 0L)
    assert(m0("numAddedFiles").toLong == 2L, m0.toString)
    assert(m0("numAddedBytes").toLong > 0L)
    assert(m0("numOutputRows").toLong == 10L)
    assert(!m0.contains("numRemovedFiles"))

    LakeWriter.appendDelta(spark.range(10, 15).toDF("k").repartition(1), dir)
    val m1 = metricsAt(dir, 1L)
    assert(m1("numAddedFiles").toLong == 1L && m1("numOutputRows").toLong == 5L)

    LakeWriter.deleteWhere(spark, dir, "k < 3")
    val m2 = metricsAt(dir, 2L)
    assert(m2("numRemovedFiles").toLong >= 1L, m2.toString)

    LakeWriter.compactDelta(spark, dir, minFiles = 1)
    val v = DeltaReader.snapshot(spark, dir, None).version
    val m3 = metricsAt(dir, v)
    assert(m3("numRemovedFiles").toLong >= 2L && m3("numAddedFiles").toLong >= 1L,
      m3.toString)

    LakeWriter.alterProperties(spark, dir, Map("team" -> "ml"))
    val m4 = metricsAt(dir, v + 1)
    assert(m4.isEmpty, m4.toString)
  }

  test("operationParameters surface in history: DELETE/UPDATE record their predicate") {
    val dir = tmp("params")
    LakeWriter.writeDelta(spark.range(10).toDF("k"), dir)
    LakeWriter.deleteWhere(spark, dir, "k = 7")
    LakeWriter.updateWhere(spark, dir, "k = 3", Map("k" -> "300"))
    val rows = DeltaReader.history(spark, dir)
      .select(col("version"), col("operation"), col("operationParameters"))
      .as[(Long, String, Map[String, String])].collect()
      .map { case (v, op, p) => v -> ((op, p)) }.toMap
    assert(rows(1L)._1 == "DELETE" && rows(1L)._2.get("predicate").contains("k = 7"),
      rows(1L).toString)
    assert(rows(2L)._1 == "UPDATE" && rows(2L)._2.get("predicate").contains("k = 3"),
      rows(2L).toString)
  }

  test("per-operation aliases: WRITE carries numFiles/numOutputBytes, UPDATE carries numAddedChangeFiles, MERGE the target trio") {
    val dir = tmp("alias")
    LakeWriter.writeDelta(spark.range(10).toDF("k").repartition(2), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val m0 = metricsAt(dir, 0L)
    // delta-spark's WRITE vocabulary beside the uniform one, same values
    assert(m0("numFiles") == m0("numAddedFiles"), m0.toString)
    assert(m0("numOutputBytes") == m0("numAddedBytes"), m0.toString)
    LakeWriter.appendDelta(spark.range(10, 15).toDF("k"), dir)
    assert(metricsAt(dir, 1L).contains("numFiles"))
    LakeWriter.updateWhere(spark, dir, "k = 4", Map("k" -> "400"))
    val mu = metricsAt(dir, 2L)
    assert(mu("numAddedChangeFiles") == mu("numCdcFiles"), mu.toString)
    assert(!mu.contains("numFiles"), s"UPDATE must not claim WRITE's numFiles: $mu")
    LakeWriter.mergeInto(spark, dir, spark.range(12, 20).toDF("k"), Seq("k"))
    val mm = metricsAt(dir, 3L)
    assert(mm("numTargetFilesAdded") == mm("numAddedFiles"), mm.toString)
    assert(mm.get("numTargetFilesRemoved") == mm.get("numRemovedFiles"), mm.toString)
  }

  test("already-carrying guard scopes to the commitInfo line: a parameter VALUE containing the literal does not suppress injection") {
    // a commit whose operationParameters value embeds the literal
    // "operationMetrics": — only the FIRST line may veto injection
    val body = ("""{"commitInfo":{"timestamp":0,"operation":"WRITE",""" +
      """"operationParameters":{"note":"{\"operationMetrics\":{}}"},"engineInfo":"graft"}}""" + "\n" +
      """{"add":{"path":"p.parquet","partitionValues":{},"size":10,""" +
      """"modificationTime":1,"dataChange":true,"stats":"{\"numRecords\":3}"}}""" + "\n")
      .getBytes("UTF-8")
    val out = new String(LakeWriter.injectOperationMetrics(body), "UTF-8")
    assert(out.linesIterator.next().contains("\"operationMetrics\":"),
      s"injection suppressed by a value match: ${out.linesIterator.next()}")
    assert(out.contains("\"numOutputRows\":\"3\""), out)
    // and a commitInfo that DOES carry metrics stays untouched
    val stamped = LakeWriter.injectOperationMetrics(out.getBytes("UTF-8"))
    assert(new String(stamped, "UTF-8") == out)
  }

  test("CDF mutations meter change files; ICT stamping coexists") {
    val dir = tmp("cdf")
    LakeWriter.writeDelta(spark.range(8).toDF("k"), dir)
    LakeWriter.alterProperties(spark, dir, Map(
      "delta.enableChangeDataFeed" -> "true",
      "delta.enableInCommitTimestamps" -> "true"))
    LakeWriter.updateWhere(spark, dir, "k = 4", Map("k" -> "400"))
    val v = DeltaReader.snapshot(spark, dir, None).version
    val m = metricsAt(dir, v)
    assert(m("numCdcFiles").toLong >= 1L && m("numCdcBytes").toLong > 0L, m.toString)
    assert(m("numAddedFiles").toLong >= 1L && m("numRemovedFiles").toLong >= 1L)
    // the same commit is ICT-stamped — injection did not displace it
    val hist = DeltaReader.history(spark, dir)
      .where(col("version") === v).select(col("timestamp")).as[Long].head()
    assert(hist > 0L)
  }
}
