package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame

/** MERGE INTO (`LakeWriter.mergeInto`) — the default upsert shape. */
class DeltaMergeSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def rows(df: DataFrame): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("id", "v").as[(Long, String)].collect().toSet
  }

  test("upsert: matched rows replaced, unmatched inserted, untouched file preserved") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_merge_")
    LakeWriter.writeDelta(Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir)
    LakeWriter.appendDelta(Seq((2L, "c")).toDF("id", "v").coalesce(1), dir)
    val before = DeltaReader.snapshot(spark, dir, None)

    // id=1 matches (update), id=9 is new (insert); version 1's file
    // holds no match and must keep its log entry
    val removed = LakeWriter.mergeInto(spark, dir,
      Seq((1L, "B!"), (9L, "i")).toDF("id", "v"), Seq("id"))
    assert(removed.size == 1)
    assert(rows(DeltaReader.read(spark, dir)) ==
      Set((0L, "a"), (1L, "B!"), (2L, "c"), (9L, "i")))
    // time travel below the merge sees the pre-merge rows
    assert(rows(DeltaReader.read(spark, dir, Some(1L))) ==
      Set((0L, "a"), (1L, "b"), (2L, "c")))
    val after = DeltaReader.snapshot(spark, dir, None)
    assert(before.active.map(_.path).toSet.intersect(after.active.map(_.path).toSet).size == 1)

    // merging the same source again is a rewrite to identical content
    LakeWriter.mergeInto(spark, dir, Seq((1L, "B!"), (9L, "i")).toDF("id", "v"), Seq("id"))
    assert(rows(DeltaReader.read(spark, dir)) ==
      Set((0L, "a"), (1L, "B!"), (2L, "c"), (9L, "i")))
  }

  test("pure-insert merge appends without rewriting; empty source is a no-op") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_merge_ins_")
    LakeWriter.writeDelta(Seq((0L, "a")).toDF("id", "v").coalesce(1), dir)
    val v0files = DeltaReader.snapshot(spark, dir, None).active.map(_.path).toSet

    assert(LakeWriter.mergeInto(spark, dir,
      Seq((5L, "e")).toDF("id", "v"), Seq("id")) == Nil)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (5L, "e")))
    // the original file was NOT rewritten
    assert(v0files.subsetOf(
      DeltaReader.snapshot(spark, dir, None).active.map(_.path).toSet))

    val ver = DeltaReader.snapshot(spark, dir, None).version
    assert(LakeWriter.mergeInto(spark, dir,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id")) == Nil)
    assert(DeltaReader.snapshot(spark, dir, None).version == ver)
  }

  test("duplicate source keys refuse; duplicate TARGET keys keep multiplicity") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_merge_dup_")
    // target holds id=1 twice (legal; e.g. pre-dedup corpus)
    LakeWriter.writeDelta(Seq((1L, "x"), (1L, "y")).toDF("id", "v").coalesce(1), dir)

    val e = intercept[IllegalArgumentException] {
      LakeWriter.mergeInto(spark, dir,
        Seq((1L, "p"), (1L, "q")).toDF("id", "v"), Seq("id"))
    }
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)

    // one source row governs BOTH target duplicates
    LakeWriter.mergeInto(spark, dir, Seq((1L, "z")).toDF("id", "v"), Seq("id"))
    val out = DeltaReader.read(spark, dir).select("id", "v").as[(Long, String)].collect()
    assert(out.toSeq.sorted == Seq((1L, "z"), (1L, "z")))
  }

  test("partitioned upsert: moved and inserted rows land under the right partitions") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_merge_part_")
    LakeWriter.writeDelta(
      Seq((0L, "a", "x"), (1L, "b", "y")).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    // id=1 moves partition y→x via the merge; id=7 inserts into z
    LakeWriter.mergeInto(spark, dir,
      Seq((1L, "b2", "x"), (7L, "n", "z")).toDF("id", "v", "p"), Seq("id"))
    val out = DeltaReader.read(spark, dir)
    assert(out.where("p = 'x'").count() == 2 &&
      out.where("p = 'y'").count() == 0 && out.where("p = 'z'").count() == 1)
    val active = DeltaReader.snapshot(spark, dir, None).active
    assert(active.forall(a =>
      a.path.startsWith("p=" + a.partitionValues("p") + "/")), active.map(_.path))
  }

  test("streaming upsert batches apply exactly once: create, merge, replay-skip") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_upsert_")
    val appId = "cdc-apply"
    // batch 0 creates the table
    graft.streaming.DeltaStream.upsertBatch(
      Seq((0L, "a"), (1L, "b")).toDF("id", "v").coalesce(1), dir, appId, 0L, Seq("id"))
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "b")))
    // batch 1 merges: key 1 updates, key 2 inserts
    graft.streaming.DeltaStream.upsertBatch(
      Seq((1L, "B"), (2L, "c")).toDF("id", "v").coalesce(1), dir, appId, 1L, Seq("id"))
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "B"), (2L, "c")))
    val v = DeltaReader.snapshot(spark, dir, None).version
    // a crash-replay of batch 1 with DIFFERENT content must be skipped
    // (the watermark says it already committed)
    graft.streaming.DeltaStream.upsertBatch(
      Seq((1L, "WRONG")).toDF("id", "v").coalesce(1), dir, appId, 1L, Seq("id"))
    assert(DeltaReader.snapshot(spark, dir, None).version == v)
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "a"), (1L, "B"), (2L, "c")))
    // a later batch still applies
    graft.streaming.DeltaStream.upsertBatch(
      Seq((0L, "A2")).toDF("id", "v").coalesce(1), dir, appId, 2L, Seq("id"))
    assert(rows(DeltaReader.read(spark, dir)) == Set((0L, "A2"), (1L, "B"), (2L, "c")))
    // and a duplicate-keyed batch refuses loudly (MERGE ambiguity)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.DeltaStream.upsertBatch(
        Seq((5L, "x"), (5L, "y")).toDF("id", "v").coalesce(1), dir, appId, 3L, Seq("id"))
    }
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)
  }
}
