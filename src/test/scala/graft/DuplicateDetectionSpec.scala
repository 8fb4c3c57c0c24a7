package graft

import graft.dup.DuplicateDetection
import graft.index.{LakeIndexer, LakeTable}
import org.apache.spark.sql.functions._

/** Pins DuplicateDetection's internals after the r17 optimization that
  * derives per-table row counts from the SIGNATURE frame (one row per
  * distinct (tableid, rowid) by construction) instead of re-shuffling
  * the full cell index through a distinct — the table-level coverage
  * thresholds depend on those counts being exact.
  */
class DuplicateDetectionSpec extends SparkSpec {

  /** Tables 1 and 2: rows 0-2 of table 2 duplicate table 1 exactly
    * (same cell values), row 3 of table 2 is unique. Table 1 has 3
    * rows, table 2 has 4 — so t2 covers ALL of t1 (min(3,4)=3 dups).
    */
  private def lakeCells = {
    val s = spark
    import s.implicits._
    val t1 = Seq((0L, "alice", "10"), (1L, "bob", "20"), (2L, "carol", "30"))
      .toDF("k", "name", "v")
    val t2 = Seq((0L, "alice", "10"), (1L, "bob", "20"), (2L, "carol", "30"),
      (3L, "dave", "40")).toDF("k", "name", "v")
    LakeIndexer.cells(Seq(
      LakeTable(1, "t1", t1, col("k")),
      LakeTable(2, "t2", t2, col("k"))))
  }

  test("duplicate row pairs: exactly the three duplicated rows, cross-table") {
    val pairs = DuplicateDetection.duplicateRowPairs(lakeCells)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(pairs == Set((1, 0L, 2, 0L), (1, 1L, 2, 1L), (1, 2L, 2, 2L)))
  }

  test("table pairs threshold uses exact per-table row counts from the sig frame") {
    val cells = lakeCells
    val sigs = DuplicateDetection.rowSignatures(cells)
    // n_dup = 3 >= min(n1=3, n2=4) -> the pair qualifies; a count
    // inflated by per-row cell multiplicity (5 cells/row) would still
    // pass, but a DEFLATED one (e.g. counting distinct sigs instead of
    // rows) would not — pin the exact verdict and the sizes source
    val got = DuplicateDetection.duplicateTablePairsFromSigs(cells, sigs)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 2)))
    val sizes = sigs.groupBy("tableid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1 -> 3L, 2 -> 4L))
  }

  test("duplicateTablesForInput: full-input coverage and full-extent coverage both qualify") {
    val s = spark
    import s.implicits._
    val cells = lakeCells
    // input = table 1's rows verbatim: t1 covers the whole input AND
    // its own extent; t2 covers the whole input (3 of 3) but not its
    // own extent (3 of 4) — both qualify under the coverage rule
    val in = Seq((0L, "alice", "10"), (1L, "bob", "20"), (2L, "carol", "30"))
      .toDF("k", "name", "v")
    val inputCells = LakeIndexer.cells(Seq(LakeTable(0, "input", in, col("k"))))
    val got = DuplicateDetection.duplicateTablesForInput(inputCells, cells)
      .collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2))
  }
}
