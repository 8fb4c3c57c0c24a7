package graft

import graft.sources.{DeltaReader, LakeWriter}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions.col

/** End-to-end lakehouse curation: a raw parquet landing zone becomes a
  * governed Delta corpus (convert → idempotent COPY INTO → a
  * data-removal DELETE), the corpus curates through the text stack
  * (corpus-wide line dedup + Gopher gate + PII scrub) into a curated
  * Delta table, and the curated table ships as reproducible training
  * shards — every step through the same production operators the
  * harness checks individually.
  */
class PipelineIntegrationSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  test("landing zone -> governed corpus -> curated table -> training shards") {
    val s = spark
    import s.implicits._
    val land = tmp("graft_e2e_land_")
    val corpus = tmp("graft_e2e_corpus_") + "/raw"
    val curated = tmp("graft_e2e_curated_") + "/cur"

    def mkDoc(id: Long, body: String) = (id, body)
    val goodBody = ("solid training text flows here with the and of it " * 8).trim
    // batch 1 lands as plain parquet and is CONVERTED in place
    Seq(
      mkDoc(1L, goodBody + " alpha"),
      mkDoc(2L, "too short"),
      mkDoc(3L, goodBody + " beta")
    ).toDF("doc_id", "text").coalesce(1).write.parquet(corpus)
    assert(LakeWriter.convertToDelta(spark, corpus) == 1)

    // batch 2 arrives in the landing zone and COPY INTOs exactly once
    def landFile(name: String, rows: Seq[(Long, String)]): String = {
      val sub = new java.io.File(land, name)
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(sub.getPath)
      sub.listFiles().find(_.getName.endsWith(".parquet")).get.getPath
    }
    val f2 = landFile("b2", Seq(
      mkDoc(4L, goodBody + " gamma with mail bob@example.org inside"),
      mkDoc(5L, goodBody + " alpha") // near-copy of doc 1 (shares its tail line)
    ))
    assert(LakeWriter.copyInto(spark, corpus, Seq(f2)).size == 1)
    assert(LakeWriter.copyInto(spark, corpus, Seq(f2)).isEmpty) // replay: no-op
    assert(DeltaReader.read(spark, corpus).count() == 5)

    // a data-removal request deletes doc 2's row from the GOVERNED table
    assert(LakeWriter.deleteWhere(spark, corpus, "doc_id = 2").nonEmpty)
    val governed = DeltaReader.read(spark, corpus)
    assert(governed.count() == 4)

    // curation: corpus-wide line dedup -> Gopher gate -> PII scrub
    val deduped = TextAnalysis.lineDedup(governed)
      .where(col("n_kept") > 0)
      .select(col("doc_id"), col("text_clean").as("text"))
    val gate = TextAnalysis.gopherRules(deduped, minStopHits = 1)
      .where(col("passes") === 1).select("doc_id")
    val scrubbed = TextAnalysis.piiSignals(deduped)
      .join(gate, "doc_id")
      .select(col("doc_id"), col("scrubbed").as("text"))
    LakeWriter.writeDelta(scrubbed, curated)

    val cur = DeltaReader.read(spark, curated).as[(Long, String)].collect().toMap
    // docs 1, 3, 4 survive; doc 5 was a whole-line duplicate of doc 1
    // (its single line deduped away -> dropped); doc 2 was deleted
    assert(cur.keySet == Set(1L, 3L, 4L), s"got ${cur.keySet}")
    assert(cur(4L).contains("<EMAIL>") && !cur(4L).contains("bob@example.org"))

    // the curated table is itself governed: history carries the lineage
    val ops = DeltaReader.history(spark, corpus).collect().map(_.getString(1)).toSeq
    assert(ops.contains("CONVERT") && ops.contains("COPY INTO") && ops.contains("DELETE"))

    // ship: seed-reproducible training shards from the curated table
    val shards = tmp("graft_e2e_shards_")
    LakeWriter.writeTrainingShards(
      DeltaReader.read(spark, curated), s"$shards/run1", numShards = 2, seed = 7)
    LakeWriter.writeTrainingShards(
      DeltaReader.read(spark, curated), s"$shards/run2", numShards = 2, seed = 7)
    val r1 = spark.read.parquet(s"$shards/run1").orderBy("doc_id").collect().toSeq
    val r2 = spark.read.parquet(s"$shards/run2").orderBy("doc_id").collect().toSeq
    assert(r1 == r2, "same seed must ship bit-identical shards")
    assert(r1.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L, 4L))

    // a DOWNSTREAM consumer streams the governed corpus and must
    // survive the data-removal DELETE (skipChangeCommits — r13): the
    // stream delivers the snapshot + later appends and skips the
    // removal version instead of dying, so one governance action
    // doesn't kill every training-shard pipeline below it
    val cp = tmp("graft_e2e_streamcp_")
    import org.apache.spark.sql.streaming.Trigger
    def drainIds(): Set[Long] = {
      val got = scala.collection.mutable.Set.empty[Long]
      val q = spark.readStream.format("graft-delta")
        .option("skipChangeCommits", "true").load(corpus)
        .writeStream.option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized {
            got ++= df.select("doc_id").collect().map(_.getLong(0))
          }
          ()
        }.start()
      q.awaitTermination(); got.toSet
    }
    assert(drainIds() == Set(1L, 3L, 4L, 5L), "initial snapshot (post-delete)")
    val f3 = landFile("b3", Seq(mkDoc(6L, goodBody + " delta")))
    assert(LakeWriter.copyInto(spark, corpus, Seq(f3)).size == 1)
    assert(LakeWriter.deleteWhere(spark, corpus, "doc_id = 5").nonEmpty)
    assert(drainIds() == Set(6L),
      "restart delivers the append and skips the removal version")
  }
}
