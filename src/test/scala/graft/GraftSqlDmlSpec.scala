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

  test("unsupported merge shapes refuse loudly; non-graft DML passes through") {
    val d = freshDir("ref")
    LakeWriter.writeDelta(base, d)
    val e = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft_delta.`$d` AS t USING (SELECT 1L AS id) AS s
           |ON t.id = s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("upsert contract"))
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
}
