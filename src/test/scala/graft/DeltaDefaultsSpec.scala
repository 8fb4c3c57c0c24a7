package graft

import graft.sources.{DeltaReader, LakeWriter, MergeClause, MergeInsert, MergeInsertAll, MergeUpdateAll}
import org.apache.spark.sql.functions._

/** Column DEFAULTs (`allowColumnDefaults`) and MERGE WITH SCHEMA
  * EVOLUTION — the two everyday delta-spark surfaces round 10 still
  * refused.
  */
class DeltaDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_def_$tag").resolve("t")
      .toAbsolutePath.toString

  test("ALTER COLUMN SET DEFAULT: future writes omitting the column take it") {
    val d = freshDir("set")
    LakeWriter.writeDelta(Seq((1L, "a", 0)).toDF("id", "s", "score"), d)
    LakeWriter.alterColumnDefault(spark, d, "score", Some("42"))
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(snap.minWriter == 7 && snap.writerFeatures.contains("allowColumnDefaults"))
    // append omitting the defaulted column: filled with 42
    LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "s"), d)
    val rows = DeltaReader.read(spark, d).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(rows.toSeq == Seq((1L, 0), (2L, 42)))
  }

  test("SQL: INSERT with a column list may omit DEFAULTed columns") {
    GraftExtensions.register(spark)
    val d = freshDir("ins")
    LakeWriter.writeDelta(Seq((1L, "a", 0)).toDF("id", "s", "score"), d)
    spark.sql(s"ALTER TABLE graft_delta.`$d` ALTER COLUMN score SET DEFAULT 7")
    spark.sql(s"INSERT INTO graft_delta.`$d` (id, s) VALUES (2, 'b')")
    assert(DeltaReader.read(spark, d).where("id = 2").head().getInt(2) == 7)
    // omitting a column WITHOUT a default still refuses
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_delta.`$d` (id, score) VALUES (3, 1)")
    }
    assert(e.getMessage.contains("DEFAULT"))
  }

  test("MERGE insert clauses fill omitted DEFAULTed columns") {
    val d = freshDir("mrg")
    LakeWriter.writeDelta(Seq((1L, "a", 0)).toDF("id", "s", "score"), d)
    LakeWriter.alterColumnDefault(spark, d, "score", Some("9"))
    LakeWriter.mergeIntoClauses(spark, d,
      Seq((5L, "e")).toDF("id", "s"), Seq("id"),
      matched = Nil,
      notMatched = Seq(MergeClause(None,
        MergeInsert(Map("id" -> "s.id", "s" -> "s.s")))))
    assert(DeltaReader.read(spark, d).where("id = 5").head().getInt(2) == 9)
  }

  test("DROP DEFAULT restores the refusal; non-constant defaults refuse") {
    val d = freshDir("drop")
    LakeWriter.writeDelta(Seq((1L, "a", 0)).toDF("id", "s", "score"), d)
    LakeWriter.alterColumnDefault(spark, d, "score", Some("1"))
    LakeWriter.alterColumnDefault(spark, d, "score", None)
    intercept[Exception] {
      LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "s"), d)
    }
    val e = intercept[IllegalArgumentException] {
      LakeWriter.alterColumnDefault(spark, d, "score", Some("id + 1"))
    }
    assert(e.getMessage.contains("constant"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns evolve the table") {
    val d = freshDir("evo")
    LakeWriter.writeDelta(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    val src = Seq((2L, "B", 0.9), (3L, "c", 0.5)).toDF("id", "s", "conf")
    LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
      matched = Seq(MergeClause(None, MergeUpdateAll)),
      notMatched = Seq(MergeClause(None, MergeInsertAll)),
      schemaEvolution = true)
    val got = DeltaReader.read(spark, d).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      (1L, "a", None),          // untouched old row: null new column
      (2L, "B", Some(0.9)),     // updated: takes the source's new column
      (3L, "c", Some(0.5))))    // inserted
    // schema evolved in the log
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("id", "s", "conf"))
    // time travel below the merge replays the OLD schema
    assert(DeltaReader.read(spark, d, Some(0L)).columns.toSeq == Seq("id", "s"))
  }

  test("SQL: MERGE WITH SCHEMA EVOLUTION un-refused") {
    GraftExtensions.register(spark)
    val d = freshDir("evosql")
    LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "s"), d)
    Seq((1L, "A", 5L), (9L, "z", 7L)).toDF("id", "s", "extra")
      .createOrReplaceTempView("graft_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft_delta.`$d` AS t
         |USING graft_evo_src AS src
         |ON t.id = src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = DeltaReader.read(spark, d).orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((1L, 5L), (9L, 7L)))
  }

  test("evolution on a column-mapped table assigns fresh physical names") {
    val d = freshDir("evocm")
    LakeWriter.writeDeltaMapped(Seq((1L, "a")).toDF("id", "s"), d)
    val src = Seq((2L, "b", 3)).toDF("id", "s", "n")
    LakeWriter.mergeIntoClauses(spark, d, src, Seq("id"),
      matched = Seq(MergeClause(None, MergeUpdateAll)),
      notMatched = Seq(MergeClause(None, MergeInsertAll)),
      schemaEvolution = true)
    val snap = DeltaReader.snapshot(spark, d, None)
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val nf = schema.fields.find(_.name == "n").get
    assert(nf.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong >= 3)
    val got = DeltaReader.read(spark, d).orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(got.toSeq == Seq((1L, -1), (2L, 3)))
  }

  test("without WITH SCHEMA EVOLUTION, extra source columns do NOT evolve") {
    val d = freshDir("noevo")
    LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "s"), d)
    LakeWriter.mergeIntoClauses(spark, d,
      Seq((2L, "b", 1.0)).toDF("id", "s", "extra"), Seq("id"),
      matched = Nil, notMatched = Seq(MergeClause(None,
        MergeInsert(Map("id" -> "s.id", "s" -> "s.s")))))
    assert(DeltaReader.read(spark, d).columns.toSeq == Seq("id", "s"))
  }
}
