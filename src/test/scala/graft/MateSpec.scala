package graft

import graft.index.{LakeIndexer, LakeTable}
import graft.mate.Mate
import org.apache.spark.sql.functions._

/** MATE on a hand-built toy lake where the expected ranking is obvious. */
class MateSpec extends SparkSpec {

  private def lake() = {
    val s = spark
    import s.implicits._
    // table 1: joins on both (city, seg) in columns (1, 2)
    val t1 = Seq((0L, "berlin", "gold", 10), (1L, "paris", "gold", 20),
      (2L, "rome", "silver", 30), (3L, "oslo", "none", 40))
      .toDF("k", "city", "seg", "x")
    // table 2: only the city column joins
    val t2 = Seq((0L, "berlin", 1), (1L, "paris", 2), (2L, "lima", 3))
      .toDF("k", "city", "y")
    LakeIndexer.cells(Seq(
      LakeTable(1, "t1", t1, col("k")),
      LakeTable(2, "t2", t2, col("k"))))
  }

  private def input() = {
    val s = spark
    import s.implicits._
    Seq((100L, "berlin", "gold"), (101L, "paris", "gold"), (102L, "rome", "silver"),
      (103L, "lima", "gold")).toDF("rid", "city", "seg")
  }

  test("multi-attribute join search ranks the fully-matching table first") {
    val top = Mate.joinSearch(input(), col("rid"), Seq("city", "seg"), lake(), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // t1 matches (city,seg) on rows berlin/gold, paris/gold, rome/silver → 3
    // t2 never has a seg value → no verified match
    assert(top.toSeq == Seq((1, "1_2", 3L)))
  }

  test("single-attribute search scores per-column matches") {
    val top = Mate.joinSearch(input(), col("rid"), Seq("city"), lake(), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // t1 city col (colid 1): berlin, paris, rome → 3; t2 (colid 1): berlin, paris, lima → 3
    // tie → tableid ascending
    assert(top.toSeq == Seq((1, "1", 3L), (2, "1", 3L)))
  }

  test("word-array index at every XASH width matches the (hi,lo) fast path") {
    val s = spark
    import s.implicits._
    val t1 = Seq((0L, "berlin", "gold", 10), (1L, "paris", "gold", 20),
      (2L, "rome", "silver", 30), (3L, "oslo", "none", 40))
      .toDF("k", "city", "seg", "x")
    val t2 = Seq((0L, "berlin", 1), (1L, "paris", 2), (2L, "lima", 3))
      .toDF("k", "city", "y")
    val tables = Seq(LakeTable(1, "t1", t1, col("k")), LakeTable(2, "t2", t2, col("k")))
    val expected = Mate.joinSearch(input(), col("rid"), Seq("city", "seg"),
      LakeIndexer.cells(tables), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    for (hs <- Seq(64, 128, 256, 512)) {
      val cellsW = LakeIndexer.cellsWords(tables, hs)
      // stored word count matches the width
      assert(cellsW.select(size(col("sk"))).first().getInt(0) == hs / 64)
      val got = Mate.joinSearchAt(input(), col("rid"), Seq("city", "seg"), cellsW, 5, hs)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == expected, s"hash_size=$hs")
    }
  }

  test("three-attribute search verifies all query columns") {
    val s = spark
    import s.implicits._
    val inp = Seq((100L, "berlin", "gold", "10"), (101L, "paris", "gold", "20"),
      (102L, "rome", "silver", "30"), (103L, "lima", "gold", "99"))
      .toDF("rid", "city", "seg", "x")
    val top = Mate.joinSearch(inp, col("rid"), Seq("city", "seg", "x"), lake(), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // t1 rows 0-2 match (city, seg, x) → columns 1_2_3, joinability 3
    assert(top.toSeq == Seq((1, "1_2_3", 3L)))
  }

  test("enrichMulticolumn scores non-join columns of the top joinable table") {
    val s = spark
    import s.implicits._
    val inp = Seq((100L, "berlin", "gold", 1.0), (101L, "paris", "gold", 2.0),
      (102L, "rome", "silver", 3.0), (103L, "lima", "gold", 4.0))
      .toDF("rid", "city", "seg", "tgt")
    val out = graft.cocoa.Cocoa.enrichMulticolumn(
      inp, col("rid"), Seq("city", "seg"), col("tgt"), lake(), 5, 3)
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    // only t1 joins on (city, seg); its join columns 1 and 2 are excluded,
    // leaving the key (colid 0) and x (colid 3), both monotone with tgt
    assert(out.map(_._1).toSet == Set("1_0", "1_3"))
    // the unmatched input row (lima) takes the mid external rank, so the
    // correlation is positive but < 1; both columns rank tgt identically
    assert(out.forall { case (_, c) => c > 0.3 })
    assert(out.map(_._2).distinct.length == 1)
  }

  test("join maps point external rows at input rows") {
    val jm = Mate.joinMaps(input(), col("rid"), Seq("city", "seg"), lake(), 5)
      .orderBy("rowid")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(jm.toSeq == Seq((1, 0L, 100L), (1, 1L, 101L), (1, 2L, 102L)))
  }
}
