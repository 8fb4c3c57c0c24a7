package graft

import graft.functions.{SimHash, TextFunctions, Xash}

/** The SQL-registered kernels agree with the library API. */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions match library results") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cleaned_text('Hello, The World!') AS c,
        |       graft_simhash('the quick brown fox') AS s,
        |       graft_xash('hello') AS x,
        |       graft_super_key(array('hello', 'germany')) AS k""".stripMargin)
      .collect()(0)

    assert(r.getAs[String]("c") == TextFunctions.cleanedTextLocal("Hello, The World!"))
    assert(r.getAs[Long]("s") == SimHash.simhash64("the quick brown fox"))
    val x = r.getAs[scala.collection.Seq[Long]]("x")
    assert((x(0), x(1)) == Xash.xash128("hello"))
    val k = r.getAs[scala.collection.Seq[Long]]("k")
    assert((k(0), k(1)) == Xash.superKey(Seq("hello", "germany")))

    val d = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
      .collect()(0).getAs[Double]("d")
    assert(d == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)

    val r2 = spark.sql(
      """SELECT graft_xash_words('hello', 256) AS xw,
        |       graft_super_key_words(array('hello', 'germany'), 64) AS skw,
        |       graft_contains_words(graft_super_key_words(array('hello', 'germany'), 128),
        |                            graft_xash_words('hello', 128)) AS cw,
        |       graft_minhash_sig(array(7L, 8L, 9L), 16) AS sig,
        |       graft_term_stats('the cat sat on the mat', array('the', 'mat')) AS ts
        |""".stripMargin).collect()(0)
    assert(r2.getAs[scala.collection.Seq[Long]]("xw").toSeq ==
      Xash.xashWords("hello", 256).toSeq)
    assert(r2.getAs[scala.collection.Seq[Long]]("skw").toSeq ==
      Xash.superKeyWords(Seq("hello", "germany"), 64).toSeq)
    assert(r2.getAs[Boolean]("cw"))
    assert(r2.getAs[scala.collection.Seq[Long]]("sig").length == 16)
    assert(r2.getAs[scala.collection.Seq[Double]]("ts").toSeq == Seq(6.0, 2.0, 1.0))
  }

  test("graft_delta table functions: SQL-only Delta reads, time travel, CDF window") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf").resolve("t")
      .toAbsolutePath.toString
    graft.sources.LakeWriter.writeDelta(
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    graft.sources.LakeWriter.deleteWhere(spark, dir, "id % 2 = 0")
    // latest snapshot through pure SQL
    assert(spark.sql(s"SELECT count(*) AS c FROM graft_delta('$dir')")
      .head().getLong(0) == 10L)
    // time travel + aggregation over the TVF
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_delta('$dir', 0) WHERE id > 15")
      .head().getLong(0) == 5L)
    // the CDF window as a table
    val ch = spark.sql(
      s"""SELECT _change_type, count(*) AS c
         |FROM graft_delta_changes('$dir', 1, 1) GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 10L))
    // joins against ordinary relations work (it is just a plan)
    val joined = spark.sql(
      s"""SELECT count(*) AS c FROM graft_delta('$dir') a
         |JOIN graft_delta('$dir', 0) b ON a.id = b.id""".stripMargin)
      .head().getLong(0)
    assert(joined == 10L)
    // non-literal arguments refuse with the analysis-time explanation
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_delta(repeat('x', 2))").collect())
    assert(e.getMessage.contains("literal"), e.getMessage)
    // row-tracked reads from SQL
    graft.sources.LakeWriter.enableRowTracking(spark, dir)
    val rid = spark.sql(
      s"SELECT count(DISTINCT _row_id) AS c, max(_row_commit_version) AS v " +
        s"FROM graft_delta_rows('$dir')").head()
    assert(rid.getLong(0) == 10L)
  }

  test("kernels run inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("graft_xash(graft_cleaned_text(text)) AS x")
    // would throw at execution if StaticInvoke codegen were broken
    assert(df.collect().length == 500)
    // "*(1) Project [static_invoke(...)]" — the * marks a codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("static_invoke"))
  }
}
