package graft

import graft.sources._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The general MERGE: conditional multi-clause semantics (the
  * CDC-apply shape), first-match-wins ordering, BY SOURCE clauses,
  * insert-only merges, complete change data, and the refusal battery.
  */
class DeltaMergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mc_$tag").resolve("t")
      .toAbsolutePath.toString

  private def base: DataFrame =
    (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("id", "v")

  test("CDC apply: delete/update/insert clauses fold a change batch in one commit") {
    val d = freshDir("cdc")
    LakeWriter.writeDelta(base, d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    // op D deletes ids 1,2; op U updates id 3; op I inserts id 100;
    // a D for a missing key (101) must NOT insert
    val changes = Seq(
      (1L, 0.0, "D"), (2L, 0.0, "D"), (3L, 999.0, "U"),
      (100L, 5.0, "I"), (101L, 0.0, "D")
    ).toDF("id", "v", "op")
    val removed = LakeWriter.mergeIntoClauses(spark, d, changes, Seq("id"),
      matched = Seq(
        MergeClause(Some("s.op = 'D'"), MergeDelete),
        MergeClause(None, MergeUpdate(Map("v" -> "s.v")))),
      notMatched = Seq(
        MergeClause(Some("s.op != 'D'"),
          MergeInsert(Map("id" -> "s.id", "v" -> "s.v")))))
    assert(removed.nonEmpty)
    val out = DeltaReader.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(1L) && !out.contains(2L))
    assert(out(3L) == 999.0)
    assert(out(100L) == 5.0 && !out.contains(101L))
    assert(out.size == 9) // 10 - 2 deleted + 1 inserted
    // complete change data in the same commit
    val ch = DeltaReader.readChanges(spark, d, 1, 1)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 2L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L))
  }

  test("first-match-wins ordering and expressions over both namespaces") {
    val d = freshDir("order")
    LakeWriter.writeDelta(base, d)
    val src = Seq((3L, 1.0), (7L, 2.0)).toDF("id", "v")
    // id 3 satisfies BOTH conditions — the first clause must govern
    LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
      matched = Seq(
        MergeClause(Some("t.id < 5"), MergeUpdate(Map("v" -> "t.v + s.v"))),
        MergeClause(Some("t.id < 100"), MergeUpdate(Map("v" -> "-1.0")))),
      notMatched = Nil)
    val out = DeltaReader.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) == 31.0)  // first clause: t.v + s.v = 30 + 1
    assert(out(7L) == -1.0)  // second clause
    assert(out(1L) == 10.0)  // untouched rows in rewritten files copy through
  }

  test("BY SOURCE clauses: target rows with no source match get the verdict") {
    val d = freshDir("bysrc")
    LakeWriter.writeDelta(base, d)
    val src = (1 to 4).map(i => (i.toLong, 0.0)).toDF("id", "v")
    // sync-to-source: unmatched target rows 5..10 — odd ones flagged, rest deleted
    LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
      matched = Nil,
      notMatched = Nil,
      notMatchedBySource = Seq(
        MergeClause(Some("t.id % 2 = 1"), MergeUpdate(Map("v" -> "0.0 - t.v"))),
        MergeClause(None, MergeDelete)))
    val out = DeltaReader.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 10.0 && out(4L) == 40.0)   // matched rows copy through
    assert(out(5L) == -50.0 && out(7L) == -70.0 && out(9L) == -90.0)
    assert(!out.contains(6L) && !out.contains(8L) && !out.contains(10L))
  }

  test("insert-only merge rewrites nothing and allows duplicate source keys") {
    val d = freshDir("insonly")
    LakeWriter.writeDelta(base, d)
    val filesBefore = DeltaReader.snapshot(spark, d, None).active.map(_.path).toSet
    // ids 1,2 match (skipped); 200 appears twice (both insert — legal
    // without MATCHED clauses)
    val src = Seq((1L, 0.0), (2L, 0.0), (200L, 1.0), (200L, 2.0)).toDF("id", "v")
    val removed = LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
      matched = Nil,
      notMatched = Seq(MergeClause(None, MergeInsertAll)))
    assert(removed.isEmpty)
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(filesBefore.subsetOf(snap.active.map(_.path).toSet)) // nothing rewritten
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 12)
    assert(out.where(col("id") === 1L).head().getDouble(1) == 10.0) // match kept target
    assert(out.where(col("id") === 200L).count() == 2)
    // an insert-only merge where everything matches writes NO commit
    val v = snap.version
    LakeWriter.mergeIntoClauses(spark, d, Seq((1L, 0.0)).toDF("id", "v"), Seq("id"),
      matched = Nil, notMatched = Seq(MergeClause(None, MergeInsertAll)))
    assert(DeltaReader.snapshot(spark, d, None).version == v)
  }

  test("refusal battery") {
    val d = freshDir("ref")
    LakeWriter.writeDelta(base, d)
    val src = Seq((1L, 0.0)).toDF("id", "v")
    // unconditioned clause not last
    val e1 = intercept[IllegalArgumentException] {
      LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
        matched = Seq(MergeClause(None, MergeDelete),
          MergeClause(Some("t.id = 1"), MergeUpdateAll)),
        notMatched = Nil)
    }
    assert(e1.getMessage.contains("unreachable"))
    // wrong action group
    val e2 = intercept[IllegalArgumentException] {
      LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
        matched = Seq(MergeClause(None, MergeInsertAll)), notMatched = Nil)
    }
    assert(e2.getMessage.contains("WHEN MATCHED"))
    // SET target outside the schema
    val e3 = intercept[IllegalArgumentException] {
      LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
        matched = Seq(MergeClause(None, MergeUpdate(Map("nope" -> "1")))),
        notMatched = Nil)
    }
    assert(e3.getMessage.contains("nope"))
    // duplicate source keys WITH a matched clause
    val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("id", "v")
    val e4 = intercept[IllegalArgumentException] {
      LakeWriter.mergeIntoClauses(spark, d, dup, Seq("id"),
        matched = Seq(MergeClause(None, MergeUpdateAll)), notMatched = Nil)
    }
    assert(e4.getMessage.contains("duplicate keys"))
    // ...and with ONLY a BY SOURCE clause: the row join still happens
    // (matched rows copy through it), so duplicates would multiply them
    val e4b = intercept[IllegalArgumentException] {
      LakeWriter.mergeIntoClauses(spark, d, dup, Seq("id"),
        matched = Nil, notMatched = Nil,
        notMatchedBySource = Seq(MergeClause(None, MergeDelete)))
    }
    assert(e4b.getMessage.contains("duplicate keys"))
    // INSERT omitting a non-nullable column refuses at build time
    val d2 = freshDir("refnn")
    LakeWriter.writeDelta(
      spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS v"), d2)
    val e5 = intercept[IllegalArgumentException] {
      LakeWriter.mergeIntoClauses(spark, d2,
        Seq((100L, 1.0)).toDF("id", "v"), Seq("id"),
        matched = Nil,
        notMatched = Seq(MergeClause(None, MergeInsert(Map("v" -> "s.v")))))
    }
    assert(e5.getMessage.contains("non-nullable"))
  }
}
