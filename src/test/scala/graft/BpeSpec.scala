package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** Pins for the BPE tokenizer (rows-only queries `bpe_merges` /
  * `bpe_encode`): hand-derived merge vectors, deterministic tie-breaks,
  * greedy-by-rank segmentation, losslessness and partition-independence
  * of the corpus encode.
  */
class BpeSpec extends SparkSpec {

  private def countsDf(ws: (String, Int)*) = {
    import spark.implicits._
    ws.flatMap { case (w, c) => Seq.fill(c)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("train reproduces the hand-derived merge sequence") {
    // corpus {hug:10, pug:5, pun:12, bun:4, hugs:5} — pair counts:
    // (u,g)=20 > (p,u)=17 > (u,n)=16 > (h,u)=15 > (g,s)=5 > (b,u)=4.
    // merge 1 = (u,g); then (u,n)=16 > (h,ug)=15; merge 2 = (u,n);
    // then (h,ug)=15 is the max; merge 3 = (h,ug).
    val wc = Bpe.wordCounts(countsDf("hug" -> 10, "pug" -> 5, "pun" -> 12, "bun" -> 4, "hugs" -> 5))
    val merges = Bpe.train(wc, 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("pair-count ties break lexicographically — training is deterministic") {
    val wc = Bpe.wordCounts(countsDf("cd" -> 1, "ab" -> 1))
    assert(Bpe.train(wc, 1) == Seq(("a", "b")))
  }

  test("training stops when no pair remains") {
    val wc = Bpe.wordCounts(countsDf("ab" -> 3))
    // "ab" exhausts after one merge; asking for 10 returns 1
    assert(Bpe.train(wc, 10) == Seq(("a", "b")))
  }

  test("encodeWord applies merges greedy-by-rank, not left-to-right") {
    val rank = Seq(("u", "g"), ("u", "n"), ("h", "ug")).zipWithIndex.toMap
    // rank order: (u,g) before (u,n) before (h,ug) regardless of position
    assert(Bpe.encodeWord("hugun", rank).toSeq == Seq("hug", "un"))
    assert(Bpe.encodeWord("nug", rank).toSeq == Seq("n", "ug"))
    assert(Bpe.encodeWord("xyz", rank).toSeq == Seq("x", "y", "z"))
  }

  test("overlapping occurrences merge left-to-right within one rank") {
    val rank = Map(("a", "a") -> 0)
    assert(Bpe.encodeWord("aaa", rank).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", rank).toSeq == Seq("aa", "aa"))
  }

  test("corpus encode is lossless, partition-independent and word-count-exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the hug of the pug"),
      (2L, "pun pun bun hugs"),
      (3L, "the the the")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordCounts(docs), 8)
    val enc1 = Bpe.encode(spark, docs, merges).collect().map(e => e.doc_id -> e).toMap
    val enc3 = Bpe.encode(spark, docs.repartition(3), merges).collect()
      .map(e => e.doc_id -> e).toMap
    for ((id, text) <- Seq(1L -> "the hug of the pug", 2L -> "pun pun bun hugs", 3L -> "the the the")) {
      val e = enc1(id)
      // lossless: concatenated tokens == the text without spaces
      assert(e.tokens.mkString("") == text.replace(" ", ""))
      assert(e.n_words == text.split(" ").length)
      assert(e.n_tokens == e.tokens.length)
      // memoized path ≡ fresh path under different partitioning
      assert(e.tokens.toSeq == enc3(id).tokens.toSeq && e.n_words == enc3(id).n_words)
    }
  }

  test("vocab ids: alphabet first, merges at base+rank; ids round-trip tokens; OOV is -1") {
    import spark.implicits._
    val docs = Seq((1L, "the hug of the pug"), (2L, "pun pun bun hugs")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs)
    val merges = Bpe.train(wc, 6)
    val v = Bpe.vocab(wc, merges)
    // alphabet = sorted distinct chars, contiguous from 0
    val alpha = "the hug of pug pun bun hugs".replace(" ", "").toSet.map((c: Char) => c.toString)
    assert(alpha.forall(c => v.contains(c)))
    assert(alpha.map(v).toSeq.sorted == (0 until alpha.size))
    merges.zipWithIndex.foreach { case ((l, r), i) => assert(v(l + r) == alpha.size + i) }
    // ids invert to the token segmentation
    val inv = v.map(_.swap)
    val toks = Bpe.encode(spark, docs, merges).collect().map(e => e.doc_id -> e.tokens.toSeq).toMap
    val ids = Bpe.encodeIds(spark, docs, merges, v).collect()
    ids.foreach { e =>
      assert(e.ids.toSeq.map(inv) == toks(e.doc_id))
      assert(e.n_tokens == e.ids.length)
    }
    // OOV character (unseen at training time) → -1
    val oov = Bpe.encodeIds(spark, Seq((9L, "thé")).toDF("doc_id", "text"), merges, v).head()
    assert(oov.ids.contains(-1))
  }

  test("encode leaves no mergeable adjacent pair inside a word") {
    import spark.implicits._
    val docs = Seq((1L, "hugging hugs hug")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordCounts(docs), 6)
    val rank = merges.zipWithIndex.toMap
    // single-word docs so token adjacency == within-word adjacency
    for (w <- Seq("hugging", "hugs", "hug")) {
      val toks = Bpe.encodeWord(w, rank)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        assert(!rank.contains((p(0), p(1))), s"unmerged pair $p in $w -> ${toks.toSeq}")
      }
    }
  }
}
