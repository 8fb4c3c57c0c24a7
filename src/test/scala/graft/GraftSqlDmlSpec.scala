package graft

import graft.sources.{DeltaReader, LakeWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-only Delta mutations through the injected parser: the
  * DELETE/UPDATE/MERGE statements route to the production writers and
  * round-trip through the SQL read TVFs — a SQL-only user can now
  * issue the mutation AND query its change feed.
  */
class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dml_$tag").resolve("t")
      .toAbsolutePath.toString

  private def base: DataFrame =
    (1 to 30).map(i => (i.toLong, Seq("a", "b", "c")(i % 3), i * 1.0))
      .toDF("id", "k", "v")

  test("DELETE FROM graft_delta.`path` routes to the production writer") {
    GraftExtensions.register(spark) // TVF reads for verification
    val d = freshDir("del")
    LakeWriter.writeDelta(base, d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    spark.sql(s"DELETE FROM graft_delta.`$d` WHERE k = 'a'")
    val left = spark.sql(s"SELECT k, count(*) AS n FROM graft_delta('$d') GROUP BY k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!left.contains("a") && left("b") == 10 && left("c") == 10)
    // and the SQL user can read the change feed of their own delete
    val ch = spark.sql(
      s"SELECT count(*) FROM graft_delta_changes('$d', 1, 1) WHERE _change_type = 'delete'")
      .head().getLong(0)
    assert(ch == 10)
  }

  test("UPDATE with alias-qualified predicate and SET strips the alias") {
    val d = freshDir("upd")
    LakeWriter.writeDelta(base, d)
    spark.sql(s"UPDATE graft_delta.`$d` AS t SET t.v = t.v * 2 WHERE t.k = 'b'")
    val got = DeltaReader.read(spark, d).where(col("k") === "b")
      .agg(sum(col("v"))).head().getDouble(0)
    val want = base.where(col("k") === "b").agg(sum(col("v") * 2)).head().getDouble(0)
    assert(got == want)
    // unconditioned UPDATE touches every row
    spark.sql(s"UPDATE graft_delta.`$d` SET v = 0.0")
    assert(DeltaReader.read(spark, d).agg(sum(col("v"))).head().getDouble(0) == 0.0)
  }

  test("MERGE upserts on the ON-clause keys; equivalent to the DataFrame API") {
    val d = freshDir("mrg")
    LakeWriter.writeDelta(base, d)
    // update ids 1..5, insert 100..102
    spark.sql(
      s"""MERGE INTO graft_delta.`$d` AS t
         |USING (SELECT id, 'z' AS k, CAST(999.0 AS DOUBLE) AS v FROM VALUES (1L), (2L), (3L),
         |       (4L), (5L), (100L), (101L), (102L) AS src(id)) AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 33)
    assert(out.where(col("k") === "z").count() == 8)
    assert(out.where(col("id") === 101L && col("v") === 999.0).count() == 1)
  }

  test("general SQL MERGE: conditional clauses, DELETE actions, BY SOURCE") {
    GraftExtensions.register(spark)
    val d = freshDir("gmrg")
    LakeWriter.writeDelta(base, d)
    // CDC apply through pure SQL: delete 'D' rows, update the rest,
    // insert non-deletes that miss; sync-delete rows absent from the
    // source would need BY SOURCE (below)
    Seq((1L, 0.0, "D"), (2L, 555.0, "U"), (100L, 9.0, "I"))
      .toDF("id", "v", "op").createOrReplaceTempView("graft_cdc_src")
    spark.sql(
      s"""MERGE INTO graft_delta.`$d` AS t USING graft_cdc_src AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v + t.v
         |WHEN NOT MATCHED AND s.op != 'D' THEN INSERT (id, k, v) VALUES (s.id, 'new', s.v)
         |""".stripMargin)
    val out = DeltaReader.read(spark, d).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    assert(!out.contains(1L))
    assert(out(2L)._2 == 555.0 + 2.0) // base v for id 2 is 2*1.0
    assert(out(100L) == ("new", 9.0))
    assert(out.size == 30)
    // BY SOURCE: delete every target row the source doesn't cover
    Seq(2L, 100L).toDF("id").createOrReplaceTempView("graft_keep_src")
    spark.sql(
      s"""MERGE INTO graft_delta.`$d` AS t USING graft_keep_src AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(DeltaReader.read(spark, d).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(2L, 100L))
    // unqualified clause references refuse loudly
    val e = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft_delta.`$d` AS t USING graft_cdc_src AS s
           |ON t.id = s.id
           |WHEN MATCHED AND op = 'D' THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("qualified"))
  }

  test("unsupported merge shapes refuse loudly; non-graft DML passes through") {
    val d = freshDir("ref")
    LakeWriter.writeDelta(base, d)
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft_delta.`$d` AS t USING (SELECT 1L AS id) AS s
           |ON t.id > s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("not t.col = s.col"))
    // a DELETE against a non-graft name must NOT reach our writer —
    // it fails Spark's own analysis (no such table), proving pass-through
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM no_such_table WHERE 1 = 1")
    }
    assert(!e3.getMessage.contains("graft"))
  }

  test("INSERT INTO appends positionally — source column names are ignored") {
    GraftExtensions.register(spark)
    val d = freshDir("ins")
    LakeWriter.writeDelta(base, d)
    spark.sql(s"INSERT INTO graft_delta.`$d` " +
      "SELECT CAST(x AS BIGINT), 'q', CAST(7.5 AS DOUBLE) FROM VALUES (200), (201) AS s(x)")
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 32)
    assert(out.where(col("id") === 200L && col("k") === "q" && col("v") === 7.5).count() == 1)
    // full-width column list in a different order realigns by name
    spark.sql(s"INSERT INTO graft_delta.`$d` (v, id, k) " +
      "SELECT CAST(1.25 AS DOUBLE), CAST(300 AS BIGINT), 'w'")
    assert(DeltaReader.read(spark, d)
      .where(col("id") === 300L && col("k") === "w" && col("v") === 1.25).count() == 1)
    // BY NAME matches columns by name regardless of position
    spark.sql(s"INSERT INTO graft_delta.`$d` BY NAME " +
      "SELECT 'y' AS k, CAST(2.5 AS DOUBLE) AS v, CAST(400 AS BIGINT) AS id")
    assert(DeltaReader.read(spark, d)
      .where(col("id") === 400L && col("k") === "y" && col("v") === 2.5).count() == 1)
  }

  test("INSERT OVERWRITE atomically replaces the table; history and CDF intact") {
    GraftExtensions.register(spark)
    val d = freshDir("ovw")
    LakeWriter.writeDelta(base, d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    spark.sql(s"INSERT OVERWRITE graft_delta.`$d` " +
      "SELECT CAST(x AS BIGINT), 'n', CAST(x * 1.0 AS DOUBLE) FROM VALUES (1), (2), (3) AS s(x)")
    val out = DeltaReader.read(spark, d)
    assert(out.count() == 3 && out.where(col("k") === "n").count() == 3)
    // ONE commit: version went 0 -> 1, and time travel below it sees the old table
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0)).count() == 30)
    // the overwrite's change feed is complete: 30 deletes + 3 inserts
    val ch = spark.sql(s"SELECT _change_type, count(*) AS n " +
      s"FROM graft_delta_changes('$d', 1, 1) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 30L, "insert" -> 3L))
  }

  test("INSERT refusals: partial column list, width mismatch, PARTITION clause") {
    GraftExtensions.register(spark)
    val d = freshDir("insref")
    LakeWriter.writeDelta(base, d)
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT INTO graft_delta.`$d` (id, k) SELECT CAST(1 AS BIGINT), 'a'")
    }
    assert(e.getMessage.contains("partial-width"))
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT INTO graft_delta.`$d` SELECT CAST(1 AS BIGINT), 'a'")
    }
    assert(e2.getMessage.contains("table has 3"))
    val e3 = intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT INTO graft_delta.`$d` PARTITION (k = 'a') " +
        "SELECT CAST(1 AS BIGINT), CAST(1.0 AS DOUBLE)")
    }
    assert(e3.getMessage.contains("PARTITION"))
    // appendOnly tables refuse OVERWRITE through the same gate as the API
    val d2 = freshDir("insao")
    LakeWriter.writeDelta(base, d2, configuration = Map("delta.appendOnly" -> "true"))
    val e4 = intercept[IllegalArgumentException] {
      spark.sql(s"INSERT OVERWRITE graft_delta.`$d2` SELECT * FROM graft_delta('$d2')")
    }
    assert(e4.getMessage.contains("appendOnly"))
  }

  test("CTAS creates a partitioned table with properties; IF NOT EXISTS no-ops") {
    GraftExtensions.register(spark)
    val d = freshDir("ctas")
    base.createOrReplaceTempView("graft_ctas_src")
    spark.sql(s"CREATE TABLE graft_delta.`$d` PARTITIONED BY (k) " +
      "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true') " +
      "AS SELECT * FROM graft_ctas_src")
    assert(DeltaReader.read(spark, d).count() == 30)
    // partitioning and properties landed in the table metadata
    val det = spark.sql(s"SELECT partitionColumns, properties FROM graft_delta_detail('$d')")
      .head()
    assert(det.getSeq[String](0) == Seq("k"))
    assert(det.getMap[String, String](1).get("delta.enableChangeDataFeed").contains("true"))
    // duplicate create refuses; IF NOT EXISTS no-ops
    val e = intercept[IllegalStateException] {
      spark.sql(s"CREATE TABLE graft_delta.`$d` AS SELECT * FROM graft_ctas_src")
    }
    assert(e.getMessage.contains("already exists"))
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft_delta.`$d` AS SELECT * FROM graft_ctas_src")
    assert(DeltaReader.read(spark, d).count() == 30)
  }

  test("CREATE OR REPLACE swaps contents atomically and keeps history") {
    GraftExtensions.register(spark)
    val d = freshDir("rtas")
    base.createOrReplaceTempView("graft_rtas_src")
    spark.sql(s"CREATE TABLE graft_delta.`$d` AS SELECT * FROM graft_rtas_src")
    spark.sql(s"CREATE OR REPLACE TABLE graft_delta.`$d` " +
      "AS SELECT * FROM graft_rtas_src WHERE k = 'a'")
    assert(DeltaReader.read(spark, d).count() == 10)
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0)).count() == 30)
    // metadata-changing REPLACE shapes refuse loudly
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE OR REPLACE TABLE graft_delta.`$d` PARTITIONED BY (k) " +
        "AS SELECT * FROM graft_rtas_src")
    }
    assert(e.getMessage.contains("partitioning"))
    // plain REPLACE of a missing table refuses; OR REPLACE creates
    val d2 = freshDir("rtas2")
    val e2 = intercept[IllegalStateException] {
      spark.sql(s"REPLACE TABLE graft_delta.`$d2` AS SELECT * FROM graft_rtas_src")
    }
    assert(e2.getMessage.contains("CREATE OR REPLACE"))
  }

  test("OPTIMIZE and VACUUM statements route to the maintenance ops") {
    GraftExtensions.register(spark)
    val d = freshDir("opt")
    LakeWriter.writeDelta(base.repartition(6), d)
    LakeWriter.appendDelta(base.repartition(6), d)
    val before = spark.sql(s"SELECT numFiles FROM graft_delta_detail('$d')")
      .head().getLong(0)
    spark.sql(s"OPTIMIZE graft_delta.`$d`")
    val after = spark.sql(s"SELECT numFiles FROM graft_delta_detail('$d')")
      .head().getLong(0)
    assert(after < before && DeltaReader.read(spark, d).count() == 60)
    // ZORDER variant: rows intact, layout-only commit
    spark.sql(s"OPTIMIZE graft_delta.`$d` ZORDER BY (id, v)")
    assert(DeltaReader.read(spark, d).count() == 60)
    // VACUUM RETAIN 1 VERSIONS reclaims the pre-optimize files: time
    // travel to v0 now refuses, latest still reads
    spark.sql(s"VACUUM graft_delta.`$d` RETAIN 1 VERSIONS")
    assert(DeltaReader.read(spark, d).count() == 60)
    intercept[Exception] { DeltaReader.read(spark, d, versionAsOf = Some(0)).count() }
    // history TVF sees the operations chain, newest first
    val ops = spark.sql(s"SELECT operation FROM graft_delta_history('$d')")
      .collect().map(_.getString(0))
    assert(ops.head == "OPTIMIZE" || ops.contains("OPTIMIZE"))
    // DESCRIBE HISTORY / DETAIL are statement sugar over the SAME TVFs
    val ops2 = spark.sql(s"DESCRIBE HISTORY graft_delta.`$d`")
      .select("operation").collect().map(_.getString(0))
    assert(ops2.toSeq == ops.toSeq)
    assert(spark.sql(s"DESC DETAIL graft_delta.`$d`")
      .select("numFiles").head().getLong(0) ==
      spark.sql(s"SELECT numFiles FROM graft_delta_detail('$d')").head().getLong(0))
    // the HOURS form needs wall-clock commits: a non-ICT table
    // refuses naming the reason (DeltaIctSpec proves the working form)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM graft_delta.`$d` RETAIN 3 HOURS")
    }
    assert(e.getMessage.contains("delta.enableInCommitTimestamps"))
  }

  test("ALTER TABLE family routes to the metadata-commit writers") {
    GraftExtensions.register(spark)
    val d = freshDir("alter")
    LakeWriter.writeDelta(base, d)
    spark.sql(s"ALTER TABLE graft_delta.`$d` ADD COLUMNS (score DOUBLE, tag STRING)")
    val out = DeltaReader.read(spark, d)
    assert(out.columns.toSeq == Seq("id", "k", "v", "score", "tag"))
    assert(out.where(col("score").isNull).count() == 30) // old files read null
    spark.sql(s"ALTER TABLE graft_delta.`$d` SET TBLPROPERTIES " +
      "('delta.appendOnly' = 'true', 'graft.note' = 'x')")
    val props = spark.sql(s"SELECT properties FROM graft_delta_detail('$d')")
      .head().getMap[String, String](0)
    assert(props.get("delta.appendOnly").contains("true") && props.get("graft.note").contains("x"))
    spark.sql(s"ALTER TABLE graft_delta.`$d` UNSET TBLPROPERTIES ('delta.appendOnly')")
    assert(!spark.sql(s"SELECT properties FROM graft_delta_detail('$d')")
      .head().getMap[String, String](0).contains("delta.appendOnly"))
    // rename needs column mapping — a CM table renames metadata-only
    val cm = freshDir("altercm")
    LakeWriter.writeDeltaMapped(base, cm)
    spark.sql(s"ALTER TABLE graft_delta.`$cm` RENAME COLUMN v TO value")
    assert(DeltaReader.read(spark, cm).columns.toSeq == Seq("id", "k", "value"))
    spark.sql(s"ALTER TABLE graft_delta.`$cm` DROP COLUMN value")
    assert(DeltaReader.read(spark, cm).columns.toSeq == Seq("id", "k"))
    // positioned ADD COLUMNS refuses with the supported form
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft_delta.`$d` ADD COLUMNS (early INT FIRST)")
    }
    assert(e.getMessage.contains("FIRST/AFTER"))
    // non-graft ALTER passes through to Spark's own resolution
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("ALTER TABLE no_such_table ADD COLUMNS (x INT)")
    }
    assert(!e2.getMessage.contains("graft"))
  }

  test("partition-scoped OPTIMIZE WHERE compacts only matching partitions") {
    GraftExtensions.register(spark)
    val d = freshDir("optw")
    LakeWriter.writeDelta(base.repartition(4), d, partitionBy = Seq("k"))
    LakeWriter.appendDelta(base.repartition(4), d)
    def filesPer: Map[String, Int] = DeltaReader.snapshot(spark, d, None).active
      .groupBy(_.partitionValues("k")).view.mapValues(_.size).toMap
    val before = filesPer
    assert(before.values.forall(_ >= 2))
    spark.sql(s"OPTIMIZE graft_delta.`$d` WHERE k = 'a'")
    val after = filesPer
    assert(after("a") == 1)
    assert(after("b") == before("b") && after("c") == before("c"))
    assert(DeltaReader.read(spark, d).count() == 60)
    // scoped ZORDER runs on the matching partition only
    spark.sql(s"OPTIMIZE graft_delta.`$d` WHERE k = 'b' ZORDER BY (id, v)")
    assert(filesPer.apply("c") == before("c"))
    assert(DeltaReader.read(spark, d).count() == 60)
    // a data-column WHERE refuses — stats skipping belongs to reads
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft_delta.`$d` WHERE v > 1.0")
    }
    assert(e.getMessage.contains("partition columns"))
    // unpartitioned tables refuse the clause
    val d2 = freshDir("optw2")
    LakeWriter.writeDelta(base.repartition(3), d2)
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft_delta.`$d2` WHERE k = 'a'")
    }
    assert(e2.getMessage.contains("unpartitioned"))
  }

  test("ADD CONSTRAINT validates existing rows, then binds every write") {
    GraftExtensions.register(spark)
    val d = freshDir("chk")
    LakeWriter.writeDelta(base, d)
    spark.sql(s"ALTER TABLE graft_delta.`$d` ADD CONSTRAINT v_pos CHECK (v > 0)")
    // the property landed and the writer floor rose past legacy v2
    val det = spark.sql(s"SELECT properties, minWriterVersion FROM graft_delta_detail('$d')")
      .head()
    assert(det.getMap[String, String](0).get("delta.constraints.v_pos").contains("v > 0"))
    assert(det.getLong(1) >= 3)
    // subsequent writes enforce it — through SQL INSERT too
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_delta.`$d` SELECT CAST(999 AS BIGINT), 'x', " +
        "CAST(-5.0 AS DOUBLE)")
    }
    assert(e.getMessage.contains("v_pos"))
    // a constraint existing rows violate refuses with the count
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_delta.`$d` ADD CONSTRAINT big CHECK (v > 100)")
    }
    assert(e2.getMessage.contains("violate"))
    // DROP CONSTRAINT unsets; the insert then lands
    spark.sql(s"ALTER TABLE graft_delta.`$d` DROP CONSTRAINT v_pos")
    spark.sql(s"INSERT INTO graft_delta.`$d` SELECT CAST(999 AS BIGINT), 'x', " +
      "CAST(-5.0 AS DOUBLE)")
    assert(DeltaReader.read(spark, d).where(col("id") === 999L).count() == 1)
  }

  test("VACUUM DRY RUN lists reclaimable files without touching them; files TVF") {
    GraftExtensions.register(spark)
    val d = freshDir("dry")
    LakeWriter.writeDelta(base.repartition(3), d)
    spark.sql(s"DELETE FROM graft_delta.`$d` WHERE k = 'a'")
    // the files TVF inventories the live adds with their stats
    val files = spark.sql(s"SELECT path, size, numRecords FROM graft_delta_files('$d')")
      .collect()
    assert(files.nonEmpty && files.forall(_.getLong(1) > 0))
    assert(files.map(_.getLong(2)).sum == 20) // post-delete live rows
    // DRY RUN returns the delete's tombstoned files, removes nothing
    val wouldGo = spark.sql(s"VACUUM graft_delta.`$d` RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0))
    assert(wouldGo.nonEmpty)
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0)).count() == 30,
      "dry run must not reclaim anything — v0 still time-travels")
    // the real vacuum then reclaims exactly that list
    spark.sql(s"VACUUM graft_delta.`$d` RETAIN 1 VERSIONS")
    intercept[Exception] { DeltaReader.read(spark, d, versionAsOf = Some(0)).count() }
    assert(DeltaReader.read(spark, d).count() == 20)
  }

  test("TRUNCATE TABLE empties the table atomically, history intact") {
    GraftExtensions.register(spark)
    val d = freshDir("trunc")
    LakeWriter.writeDelta(base, d,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    spark.sql(s"TRUNCATE TABLE graft_delta.`$d`")
    assert(DeltaReader.read(spark, d).count() == 0)
    assert(DeltaReader.read(spark, d, versionAsOf = Some(0)).count() == 30)
    // the truncate's change feed is the complete delete set
    val ch = spark.sql(s"SELECT count(*) FROM graft_delta_changes('$d', 1, 1) " +
      "WHERE _change_type = 'delete'").head().getLong(0)
    assert(ch == 30)
    // and the table accepts inserts again
    spark.sql(s"INSERT INTO graft_delta.`$d` SELECT CAST(1 AS BIGINT), 'a', " +
      "CAST(1.0 AS DOUBLE)")
    assert(DeltaReader.read(spark, d).count() == 1)
  }

  test("CONVERT TO DELTA and GENERATE manifest statements") {
    GraftExtensions.register(spark)
    // a plain parquet directory converts in place, then reads as Delta
    val raw = java.nio.file.Files.createTempDirectory("graft_cvt").resolve("t")
      .toAbsolutePath.toString
    base.repartition(2).write.parquet(raw)
    spark.sql(s"CONVERT TO DELTA parquet.`$raw`")
    assert(DeltaReader.read(spark, raw).count() == 30)
    // manifest generation returns the manifest paths as rows
    val manifests = spark.sql(
      s"GENERATE symlink_format_manifest FOR TABLE graft_delta.`$raw`")
      .collect().map(_.getString(0))
    assert(manifests.toSeq == Seq("manifest")) // unpartitioned: one root manifest
    assert(new java.io.File(raw, "_symlink_format_manifest/manifest").exists())
    // malformed forms refuse naming the supported ones
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"CONVERT TO DELTA graft_delta.`$raw`")
    }
    assert(e.getMessage.contains("CONVERT TO DELTA parquet.`path`"))
  }

  test("RESTORE and SHALLOW CLONE statements route to the table services") {
    GraftExtensions.register(spark)
    val d = freshDir("rst")
    LakeWriter.writeDelta(base, d)
    spark.sql(s"DELETE FROM graft_delta.`$d` WHERE k = 'a'")
    assert(DeltaReader.read(spark, d).count() == 20)
    spark.sql(s"RESTORE TABLE graft_delta.`$d` TO VERSION AS OF 0")
    assert(DeltaReader.read(spark, d).count() == 30)
    // clone the pre-restore state by version, zero-copy
    val c = freshDir("cln")
    spark.sql(s"CREATE TABLE graft_delta.`$c` SHALLOW CLONE graft_delta.`$d` " +
      "VERSION AS OF 1")
    assert(DeltaReader.read(spark, c).count() == 20)
    // timestamp RESTORE needs wall-clock commits: a non-ICT table
    // refuses naming the reason (DeltaIctSpec proves the working form)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"RESTORE TABLE graft_delta.`$d` TO TIMESTAMP AS OF '2020-01-01'")
    }
    assert(e.getMessage.contains("delta.enableInCommitTimestamps"))
  }
}
