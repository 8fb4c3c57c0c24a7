package graft

import graft.dedup.Dedup
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("shingles of short and normal texts") {
    val df = docs((1L, "a b c d"), (2L, "a b"), (3L, "x y z"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(df(1L) == Seq("a b c", "b c d"))
    assert(df(2L) == Seq())
    assert(df(3L) == Seq("x y z"))
  }

  test("ngram jaccard finds the duplicate pair") {
    val d = docs(
      (1L, "the cat sat on the mat today fine"),
      (2L, "the cat sat on the mat today ok"),
      (3L, "completely different words here now then"))
    val pairs = Dedup.ngramJaccard(d, 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("duplicateSpans finds maximal shared word spans on their diagonals") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10-word shared span
    val d = docs(
      (1L, s"a1 a2 $shared a3 a4"),                       // span at word 3
      (2L, s"b1 $shared b2 b3 b4"),                       // span at word 2
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"))     // no overlap
    val spans = Dedup.duplicateSpans(d, gram = 4, minWords = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // one maximal span: docs 1×2, starts 3 and 2 (1-based), 10 words —
    // the 7 overlapping 4-gram hits merged into ONE row, not 7
    assert(spans.toSeq == Seq((1L, 2L, 3L, 2L, 10L)))
  }

  test("duplicateSpans: repeated span in one doc yields one row per diagonal") {
    val span = (1 to 8).map(i => s"t$i").mkString(" ")
    val d = docs(
      (1L, s"$span x1 x2 $span"),       // span at 1 and at 11
      (2L, s"y1 $span y2 y3"))          // span at 2
    val spans = Dedup.duplicateSpans(d, gram = 4, minWords = 6)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(spans == Set((1L, 2L, 8L), (11L, 2L, 8L)))
  }

  test("semantic dedup groups near-identical vectors and keeps clusters apart") {
    val s = spark
    import s.implicits._
    // 3 orthogonal direction groups, 4 members each: member vectors are
    // the group axis plus a tiny deterministic tilt on a second axis —
    // within-group cos ≈ 0.999, across-group cos ≈ 0.
    val dim = 8
    val rows = for (g <- 0 until 3; m <- 0 until 4) yield {
      val v = new Array[Float](dim)
      v(g) = 1f
      v(g + 3) = 0.02f * (m + 1)
      ((g * 4 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Dedup.semantic(emb, tau = 0.9, nCells = 3, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member's canon is its group's min id; groups never merge
    for (g <- 0 until 3; m <- 0 until 4)
      assert(out((g * 4 + m).toLong) == (g * 4).toLong)
  }

  test("duplicateSpans run-merge reuses the window exchange (3 shuffles total)") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g x"))
    val q = Dedup.duplicateSpans(d, gram = 4, minWords = 6)
    q.collect()
    // AdaptiveSparkPlan.toString prints final AND initial plans — count
    // exchanges in the final one only
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // ONE (doc_a, doc_b, diagonal) exchange shared by the window AND
    // both aggregate phases — a second hashpartitioning exchange would
    // mean the run aggregation re-shuffled what the window partitioned
    val exchanges = "Exchange hashpartitioning\\(doc_a".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 run-merge shuffle, got $exchanges:\n$plan")
  }

  /** Brute-force diagonal reference: every maximal common word run of
    * ≥ minWords between a and b, as (start_a, start_b, len), 1-based.
    */
  private def refSpans(a: Array[String], b: Array[String], minWords: Int): Set[(Long, Long, Long)] = {
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (d <- -(b.length - 1) to (a.length - 1)) {
      var i = math.max(0, d)
      var runStart = -1
      while (i <= a.length) {
        val j = i - d
        val m = i < a.length && j >= 0 && j < b.length && a(i) == b(j)
        if (m && runStart < 0) runStart = i
        if (!m && runStart >= 0) {
          val len = i - runStart
          if (len >= minWords)
            out += (((runStart + 1).toLong, (runStart - d + 1).toLong, len.toLong))
          runStart = -1
        }
        i += 1
      }
    }
    out.toSet
  }

  test("duplicateSpans matches the brute-force diagonal reference on random corpora") {
    val rnd = new scala.util.Random(11)
    // docs stitched from a shared phrase pool → real multi-word overlaps
    val pool = Array.fill(5)(Array.fill(3 + rnd.nextInt(6))("p" + rnd.nextInt(40)).mkString(" "))
    def randDoc() = (0 until 2 + rnd.nextInt(3)).map { _ =>
      if (rnd.nextBoolean()) pool(rnd.nextInt(pool.length))
      else Array.fill(1 + rnd.nextInt(5))("n" + rnd.nextInt(40)).mkString(" ")
    }.mkString(" ")
    for (_ <- 1 to 3) {
      val ds = (1L to 6L).map(i => (i, randDoc()))
      val got = Dedup.duplicateSpans(docs(ds: _*), gram = 3, minWords = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val want = (for {
        Seq((ia, ta), (ib, tb)) <- ds.combinations(2)
        (sa, sb, len) <- refSpans(ta.split(' '), tb.split(' '), 4)
      } yield (ia, ib, sa, sb, len)).toSet
      assert(got == want, s"docs=$ds")
    }
  }

  test("duplicateSpansAcross reports left-right pairs only, any id order") {
    val span = (1 to 8).map(i => s"v$i").mkString(" ")
    val left = docs((5L, s"$span l1"), (6L, s"l2 $span"))   // 5×6 share it too
    val right = docs((2L, s"r1 r2 $span"), (9L, "x1 x2 x3 x4 x5 x6 x7 x8"))
    val out = Dedup.duplicateSpansAcross(left, right, gram = 4, minWords = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // left×left (5,6) and right-only docs never appear; doc_a > doc_b ok
    assert(out == Set((5L, 2L), (6L, 2L)))
  }

  test("removeSpans drops covered words from the later doc only") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5"))
    val spans = Dedup.duplicateSpans(d, gram = 4, minWords = 6)
    val out = Dedup.removeSpans(d, spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"a1 a2 $shared a3 a4") // earlier doc untouched
    assert(out(2L) == "b1 b2 b3 b4")          // span excised
    assert(out(3L) == "c1 c2 c3 c4 c5")       // no spans: byte-identical
  }

  test("removeSpans leaves a fully-duplicated doc as empty text") {
    val t8 = (1 to 8).map(i => s"u$i").mkString(" ")
    val d = docs((1L, t8), (2L, t8))
    val spans = Dedup.duplicateSpans(d, gram = 4, minWords = 6)
    val out = Dedup.removeSpans(d, spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == t8 && out(2L) == "")
  }

  test("removeSpans passes a null-text doc through as null, not as fully-deduplicated") {
    val s = spark
    import s.implicits._
    val t8 = (1 to 8).map(i => s"u$i").mkString(" ")
    val d = Seq((1L, t8), (2L, t8), (3L, null: String)).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, gram = 4, minWords = 6)
    val out = Dedup.removeSpans(d, spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) == "")   // genuinely fully-excised
    assert(out(3L) == null) // never touched — must stay distinguishable
  }

  test("incremental minhash with a persisted band-key table matches the recomputed form") {
    val d1 = docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"))
    val d2 = docs((3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"))
    val sigs = Dedup.minhashSignatures(d1)
    val keys = Dedup.minhashBandKeys(sigs)
    val viaKeys = Dedup.minhashLshIncremental(d2, sigs, 0.5, existingKeys = Some(keys))
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recomputed = Dedup.minhashLshIncremental(d2, sigs, 0.5)
      .select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaKeys == recomputed && viaKeys == Set((1L, 3L)))
  }

  test("minhash LSH finds the same high-similarity pair") {
    val d = docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"),
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"))
    val pairs = Dedup.minhashLsh(d, 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("incremental minhash finds exactly the pairs touching the new batch") {
    val s = spark
    import s.implicits._
    val all = docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"),   // ~ 1
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w14"),   // ~ 1, 2 (new)
      (5L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a13"))   // ~ 3    (new)
    val existing = all.where(col("doc_id") <= 3)
    val fresh = all.where(col("doc_id") > 3)
    // persisted-signature roundtrip: the index survives parquet
    val dir = java.nio.file.Files.createTempDirectory("graft_sigs_").toString
    Dedup.minhashSignatures(existing).write.parquet(s"$dir/sigs")
    val sigs = spark.read.parquet(s"$dir/sigs")
    val inc = Dedup.minhashLshIncremental(fresh, sigs, 0.5)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashLsh(all, 0.5)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    val touchingNew = full.filter { case (a, b) => a > 3 || b > 3 }
    assert(inc == touchingNew, s"inc=$inc expected=$touchingNew")
    assert(touchingNew.nonEmpty && !inc.contains((1L, 2L))) // old×old untouched
  }

  test("simhash near-dup clusters identical docs") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "unrelated totally different content"))
    val canon = Dedup.simhashNearDup(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon(1L) == 1L && canon(2L) == 1L && canon(3L) == 3L)
  }

  test("distributed label propagation converges on a chain longer than the old round cap") {
    val s = spark
    import s.implicits._
    // 0-1-2-...-30: diameter 30 exceeded the old fixed 20-round budget; with
    // pointer doubling it converges in O(log n) rounds to min label 0
    val n = 30
    val pairs = (0 until n).map(i => (i.toLong, i.toLong + 1, 1.0))
      .toDF("id_1", "id_2", "jac")
    val d = (0L to n.toLong).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .unionByName(Seq((100L, "isolated")).toDF("doc_id", "text"))
    val out = Dedup.clusters(d, pairs, localThreshold = 0) // force distributed path
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to n.toLong).forall(out(_) == 0L))
    assert(out(100L) == 100L)
  }

  test("ngram jaccard df cap drops hot-shingle buckets only") {
    // "hot one two" appears in all 4 docs (df=4) and is the ONLY shingle
    // shared by (1,2); (3,4) also share rare df=2 shingles. Capping at
    // df<=3 drops the hot bucket: pair (1,2) disappears, (3,4) survives.
    val d = docs(
      (1L, "hot one two a1 a2 a3"),
      (2L, "hot one two b1 b2 b3"),
      (3L, "hot one two rare alpha beta"),
      (4L, "zz hot one two rare alpha beta"))
    val all = Dedup.ngramJaccardPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.contains((1L, 2L)) && all.contains((3L, 4L)))
    val capped = Dedup.ngramJaccardPairs(d, maxDocFreq = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((1L, 2L)))
    assert(capped.contains((3L, 4L)))
  }

  test("brute-force knn returns k ordered neighbors") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceKnn(emb.where(col("vec_id") === 0), emb, 2).collect()
    assert(knn.map(r => (r.getInt(1), r.getLong(2))).toSeq == Seq((1, 1L), (2, 2L)))
  }

  test("pair generators match the reference pair enumeration") {
    val s = spark
    import s.implicits._
    // long/int buckets: unsorted members, singleton and empty arrays
    val li = Seq(
      Seq((5L, 50), (1L, 10), (3L, 30)),
      Seq((2L, 20)),
      Seq[(Long, Int)](),
      Seq((9L, 90), (7L, 70))
    ).toDF("ds")
      .select(graft.plans.PairGenerators.sortedLongIntPairsCol(col("ds")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(li == Set((1L, 10, 3L, 30), (1L, 10, 5L, 50), (3L, 30, 5L, 50), (7L, 70, 9L, 90)))
    // string buckets: java.lang.String ordering must hold, including a
    // supplementary character where UTF8String BINARY order diverges
    // ("\uFFFD" sorts after a surrogate-paired code point in UTF-16
    // but before it in UTF-8 bytes)
    val hi = new String(Character.toChars(0x1F600)) // U+1F600, surrogate pair
    val ss = Seq(Seq("b", hi, "\uFFFD", "a")).toDF("cs")
      .select(graft.plans.PairGenerators.sortedStringPairsCol(col("cs")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val ref = Seq("b", hi, "\uFFFD", "a").sorted
    val want = for { i <- ref.indices; j <- i + 1 until ref.length } yield (ref(i), ref(j))
    assert(ss.toSet == want.toSet && ss.length == want.length)
  }
}
