package graft

import graft.sources.{DeltaReader, IdentityColumns, LakeWriter, MergeClause, MergeInsert, MergeUpdate}
import org.apache.spark.sql.types.{LongType, Metadata, MetadataBuilder, StringType, StructField, StructType}

/** IDENTITY columns — the protocol's `identityColumns` writer
  * feature: generated bigint keys with a declared start/step, a
  * high-watermark in field metadata that every write advances
  * atomically with its adds, GENERATED ALWAYS vs BY DEFAULT
  * semantics, merge/update/overwrite interplay, and the SQL + catalog
  * CREATE surface.
  */
class DeltaIdentitySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_id_$tag").resolve("t")
      .toAbsolutePath.toString

  private def idField(name: String, start: Long = 1L, step: Long = 1L,
                      byDefault: Boolean = false): StructField =
    StructField(name, LongType, nullable = true, new MetadataBuilder()
      .putLong(IdentityColumns.StartKey, start)
      .putLong(IdentityColumns.StepKey, step)
      .putBoolean(IdentityColumns.ExplicitKey, byDefault).build())

  private def createIdTable(dir: String, start: Long = 1L, step: Long = 1L,
                            byDefault: Boolean = false): Unit = {
    val schema = StructType(Seq(idField("id", start, step, byDefault),
      StructField("v", StringType)))
    LakeWriter.writeDelta(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema), dir)
  }

  private def ids(dir: String): Seq[Long] =
    DeltaReader.read(spark, dir).select("id").as[Long].collect().toSeq

  private def watermark(dir: String): Option[Long] = {
    val snap = DeltaReader.snapshot(spark, dir, None)
    val schema = org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
      .asInstanceOf[StructType]
    val m = schema("id").metadata
    if (m.contains(IdentityColumns.WatermarkKey))
      Some(m.getLong(IdentityColumns.WatermarkKey)) else None
  }

  test("create declares the v7 feature; appends generate unique start/step values") {
    val d = freshDir("gen")
    createIdTable(d, start = 100L, step = 10L)
    val snap = DeltaReader.snapshot(spark, d, None)
    assert(snap.minWriter == 7 && snap.writerFeatures.contains("identityColumns"))
    assert(watermark(d).isEmpty)
    LakeWriter.appendDelta(Seq("a", "b", "c").toDF("v"), d)
    val first = ids(d)
    assert(first.size == 3 && first.distinct.size == 3)
    assert(first.forall(v => v >= 100 && (v - 100) % 10 == 0), first.toString)
    assert(watermark(d).contains(first.max))
    // the second batch continues strictly past the first
    LakeWriter.appendDelta(Seq("d", "e").toDF("v"), d)
    val all = ids(d)
    assert(all.size == 5 && all.distinct.size == 5)
    assert(all.filterNot(first.contains).forall(_ > first.max))
    assert(watermark(d).contains(all.max))
  }

  test("negative step generates downward; watermark tracks the minimum") {
    val d = freshDir("neg")
    createIdTable(d, start = 0L, step = -5L)
    LakeWriter.appendDelta(Seq("a", "b", "c", "d").toDF("v"), d)
    val first = ids(d)
    assert(first.distinct.size == 4 && first.forall(v => v <= 0 && v % 5 == 0))
    assert(watermark(d).contains(first.min))
    LakeWriter.appendDelta(Seq("e").toDF("v"), d)
    assert(ids(d).min < first.min)
  }

  test("GENERATED ALWAYS refuses explicit values; BY DEFAULT takes them and advances") {
    val d = freshDir("always")
    createIdTable(d)
    val e = intercept[Exception] {
      LakeWriter.appendDelta(Seq((5L, "x")).toDF("id", "v"), d)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)

    val d2 = freshDir("bydef")
    createIdTable(d2, byDefault = true)
    LakeWriter.appendDelta(Seq((500L, "x"), (600L, "y")).toDF("id", "v"), d2)
    assert(watermark(d2).contains(600L))
    // generated values continue past the explicit maximum
    LakeWriter.appendDelta(Seq("z").toDF("v"), d2)
    assert(ids(d2).max > 600L)
    // explicit values BELOW the watermark leave it unmoved
    LakeWriter.appendDelta(Seq((50L, "w")).toDF("id", "v"), d2)
    assert(watermark(d2) == Some(ids(d2).max))
  }

  test("UPDATE refuses SET on an identity column; DELETE and compaction preserve values") {
    val d = freshDir("upd")
    createIdTable(d)
    LakeWriter.appendDelta(Seq("a", "b", "c").toDF("v"), d)
    val e = intercept[Exception] {
      LakeWriter.updateWhere(spark, d, "v = 'a'", Map("id" -> "99"))
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
    val before = DeltaReader.read(spark, d).as[(Long, String)].collect().toMap
    LakeWriter.deleteWhere(spark, d, "v = 'b'")
    LakeWriter.appendDelta(Seq("d").toDF("v"), d)
    LakeWriter.compactDelta(spark, d, minFiles = 2)
    val after = DeltaReader.read(spark, d).as[(Long, String)].collect().toMap
    assert(after.filterKeys(before.contains).toMap ==
      (before - before.find(_._2 == "b").get._1).filterKeys(after.contains).toMap)
    assert(after.values.toSet == Set("a", "c", "d"))
    assert(after.keys.toSeq.distinct.size == 3)
  }

  test("MERGE: omitted identity generates on insert, SET * keeps the matched value") {
    val d = freshDir("merge")
    createIdTable(d)
    LakeWriter.appendDelta(Seq("a", "b").toDF("v"), d)
    val before = DeltaReader.read(spark, d).as[(Long, String)].collect().toMap
    // source has NO id column: matched rows update v, new rows get ids
    LakeWriter.mergeIntoClauses(spark, d,
      Seq(("a", "A"), ("c", "C")).toDF("v", "nv"), Seq("v"),
      matched = Seq(MergeClause(None,
        MergeUpdate(Map("v" -> "s.nv")))),
      notMatched = Seq(MergeClause(None,
        MergeInsert(Map("v" -> "s.nv")))))
    val after = DeltaReader.read(spark, d).as[(Long, String)].collect().toMap
    assert(after.values.toSet == Set("A", "C", "b"))
    val aId = before.find(_._2 == "a").get._1
    assert(after(aId) == "A", "matched row must keep its identity value")
    val cId = after.find(_._2 == "C").get._1
    assert(!before.contains(cId) && cId > before.keys.max,
      "inserted row generates past the watermark")
    assert(watermark(d).contains(after.keys.max))
    // explicit id in an insert clause refuses on ALWAYS
    val e = intercept[Exception] {
      LakeWriter.mergeIntoClauses(spark, d,
        Seq((999L, "z")).toDF("id", "v"), Seq("v"),
        matched = Nil,
        notMatched = Seq(MergeClause(None,
          MergeInsert(Map("id" -> "s.id", "v" -> "s.v")))))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
  }

  test("overwriteWhere burns replaced ids: the watermark never rewinds") {
    val d = freshDir("ovw")
    val schema = StructType(Seq(idField("id"), StructField("part", StringType),
      StructField("v", StringType)))
    LakeWriter.writeDelta(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema), d)
    LakeWriter.appendDelta(Seq(("x", "a"), ("x", "b"), ("y", "c")).toDF("part", "v"), d)
    val wmBefore = watermark(d).get
    LakeWriter.overwriteWhere(Seq(("x", "a2")).toDF("part", "v"), d, "part = 'x'")
    val rows = DeltaReader.read(spark, d).select("id", "v").as[(Long, String)]
      .collect().toMap
    assert(rows.values.toSet == Set("a2", "c"))
    assert(rows.find(_._2 == "a2").get._1 > wmBefore,
      "replacement rows generate past the old watermark")
    assert(watermark(d).get > wmBefore)
  }

  test("a stale-snapshot identity append conflicts loudly (no silent id reuse)") {
    val d = freshDir("occ")
    createIdTable(d)
    LakeWriter.appendDelta(Seq("seed").toDF("v"), d)
    val stale = DeltaReader.snapshot(spark, d, None)
    LakeWriter.appendDelta(Seq("winner").toDF("v"), d)
    // same snapshot -> same generation base -> MUST NOT rebase-commit
    val e = intercept[IllegalStateException] {
      LakeWriter.appendDeltaWithSnapshot(Seq("loser").toDF("v"), d,
        checkpointInterval = 0, txn = None, stale)
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // the documented retry path re-reads and generates fresh values
    LakeWriter.retryOnConflict(3) { LakeWriter.appendDelta(Seq("loser").toDF("v"), d) }
    val all = ids(d)
    assert(all.size == 3 && all.distinct.size == 3)
  }

  test("SQL end to end: CREATE ... GENERATED ALWAYS AS IDENTITY via the catalog") {
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_id_cat_")
      .toAbsolutePath.toString
    spark.conf.set("spark.sql.catalog.gid", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gid.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gid.db")
    spark.sql("CREATE TABLE gid.db.t (id BIGINT GENERATED ALWAYS AS IDENTITY " +
      "(START WITH 7 INCREMENT BY 3), v STRING)")
    val snap = DeltaReader.snapshot(spark, s"$root/db/t", None)
    assert(snap.minWriter == 7 && snap.writerFeatures.contains("identityColumns"))
    spark.sql("INSERT INTO gid.db.t (v) VALUES ('a'), ('b')")
    val got = spark.sql("SELECT id, v FROM gid.db.t").as[(Long, String)].collect()
    assert(got.length == 2 && got.map(_._1).distinct.length == 2)
    assert(got.forall { case (i, _) => i >= 7 && (i - 7) % 3 == 0 }, got.toSeq.toString)
    // a second insert continues past the watermark
    spark.sql("INSERT INTO gid.db.t (v) VALUES ('c')")
    val all = spark.sql("SELECT id FROM gid.db.t").as[Long].collect()
    assert(all.length == 3 && all.distinct.length == 3)
    // explicit values refuse on ALWAYS
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gid.db.t (id, v) VALUES (1, 'x')")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS") ||
      e.getMessage.contains("identity"), e.getMessage)
    // SQL UPDATE refuses SET on the identity column
    val e2 = intercept[Exception] {
      spark.sql("UPDATE gid.db.t SET id = 5 WHERE v = 'a'")
    }
    assert(e2.getMessage.contains("identity"), e2.getMessage)
    // BY DEFAULT flavor accepts explicit inserts
    spark.sql("CREATE TABLE gid.db.t2 (id BIGINT GENERATED BY DEFAULT AS IDENTITY, " +
      "v STRING)")
    spark.sql("INSERT INTO gid.db.t2 (id, v) VALUES (41, 'x')")
    spark.sql("INSERT INTO gid.db.t2 (v) VALUES ('y')")
    val t2 = spark.sql("SELECT id FROM gid.db.t2").as[Long].collect()
    assert(t2.length == 2 && t2.contains(41L) && t2.max > 41L, t2.toSeq.toString)
  }

  test("identity on a partition column refuses at create") {
    val d = freshDir("part")
    val schema = StructType(Seq(idField("id"), StructField("v", StringType)))
    val e = intercept[Exception] {
      LakeWriter.writeDelta(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema), d, partitionBy = Seq("id"))
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
  }

  test("appendDeltaEvolve generates the identity hole while adding a new column") {
    val d = freshDir("evo")
    createIdTable(d)
    LakeWriter.appendDelta(Seq("a").toDF("v"), d)
    LakeWriter.appendDeltaEvolve(Seq(("b", 1.5)).toDF("v", "score"), d)
    val rows = DeltaReader.read(spark, d).select("id", "v").as[(Long, String)]
      .collect().toSeq
    assert(rows.map(_._1).distinct.size == 2)
    assert(watermark(d).contains(rows.map(_._1).max))
  }
}
