package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + corpus encoding (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer step every LLM pretraining pipeline runs
  * between cleaning and packing.
  *
  * Scale split follows the classic fastBPE observation: BPE training
  * operates on the WORD-FREQUENCY TABLE, not the raw corpus, so the
  * distributed part is one grouped aggregation (map-side partial, the
  * result is vocabulary-sized, not corpus-sized). The merge loop runs
  * on the driver over the `maxWords` most frequent words — the same
  * bounded-collect discipline as the KMeans coarse quantizer
  * (sim/Similarity.scala): O(numMerges · maxWords · wordLen) regardless
  * of corpus size. Encoding is then embarrassingly parallel: merge
  * ranks broadcast, one mapPartitions pass, zero shuffles, with a
  * per-partition word→tokens memo that exploits the Zipfian word
  * distribution (each distinct word is BPE-merged once per partition,
  * not once per occurrence).
  */
object Bpe {

  /** Distributed word-frequency table: (word, cnt), one grouped
    * aggregation over `split(lower(text), ' ')` (empty tokens dropped).
    */
  def wordCounts(docs: DataFrame, text: String = "text"): DataFrame =
    docs.select(explode(split(lower(col(text)), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` merges on a word-count table. The table is
    * bounded to the `maxWords` most frequent words (ties by word
    * ascending) before collecting, so the driver loop is corpus-size-
    * independent; words past the cap only perturb pair counts by at
    * most their own total frequency. Pair-count ties break
    * lexicographically on (left, right) — training is deterministic,
    * identical counts give bit-identical merge tables.
    *
    * Returns merges in rank order (rank 0 = first, highest-count merge).
    */
  def train(wordCounts: DataFrame, numMerges: Int, maxWords: Int = 1 << 16): Seq[(String, String)] =
    trainWithVocab(wordCounts, numMerges, maxWords)._1

  /** [[train]] + [[vocab]] off ONE bounded collect of the word-count
    * table — the alphabet is a pure driver-side derivation of the same
    * `top` array the merge loop consumes, so deriving both together
    * saves a second distributed sort per tokenizer build.
    */
  def trainWithVocab(wordCounts: DataFrame, numMerges: Int,
                     maxWords: Int = 1 << 16): (Seq[(String, String)], Map[String, Int]) = {
    val top = wordCounts
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect()
    val merges = trainLocal(top.map(r => (r.getString(0), r.getLong(1))), numMerges)
    (merges, vocabLocal(top.map(_.getString(0)), merges))
  }

  /** The ONE id-table derivation both [[vocab]] and [[trainWithVocab]]
    * share — UTF-16-char alphabet split, matching [[encodeWord]]'s
    * segmentation exactly (a code-point split would assign no id to
    * the surrogate-half tokens encodeWord emits for non-BMP text).
    */
  private def vocabLocal(words: Array[String], merges: Seq[(String, String)]): Map[String, Int] = {
    val alphabet = words.flatMap(_.map(_.toString)).distinct.sorted
    val base = alphabet.zipWithIndex.toMap
    base ++ merges.zipWithIndex.map { case ((l, r), i) => (l + r, base.size + i) }
  }

  private def trainLocal(top: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      top.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (l, r) = pairCounts.keysIterator.reduceLeft { (a, b) =>
          val (ca, cb) = (pairCounts(a), pairCounts(b))
          if (cb > ca || (cb == ca && (b._1 < a._1 || (b._1 == a._1 && b._2 < a._2)))) b else a
        }
        merges += ((l, r))
        words = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
      }
      i += 1
    }
    merges.result()
  }

  /** One left-to-right pass merging every (l, r) adjacency — the
    * left-to-right order resolves overlaps the way reference BPE does
    * ("aaa" with merge (a,a) → ["aa", "a"]).
    */
  private def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var k = 0
    while (k < syms.length) {
      if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) { out += l + r; k += 2 }
      else { out += syms(k); k += 1 }
    }
    out.toArray
  }

  /** Apply a trained merge table to one word: repeatedly merge the
    * lowest-rank adjacent pair until none applies — the standard
    * greedy-by-rank BPE segmenter. Concatenating the result always
    * reproduces the word (encoding is lossless).
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestL = syms(j); bestR = syms(j + 1) }
        j += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        syms = mergeOnce(syms, bestL, bestR)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Deterministic token-id table: the alphabet (distinct single
    * characters of the trained word table, sorted) takes ids 0..A-1,
    * merged tokens follow in rank order at A+rank. Every token
    * [[encodeWord]] can emit is covered for in-vocabulary text;
    * characters unseen at training time have no id (OOV → -1 in
    * [[encodeIds]], the fallback a byte-level alphabet would remove).
    */
  def vocab(wordCounts: DataFrame, merges: Seq[(String, String)],
            maxWords: Int = 1 << 16): Map[String, Int] = {
    val top = wordCounts
      .orderBy(col("cnt").desc, col("word").asc).limit(maxWords)
      .collect().map(_.getString(0))
    vocabLocal(top, merges)
  }

  case class DocText(doc_id: Long, text: String)
  case class Encoded(doc_id: Long, n_words: Int, n_tokens: Int, tokens: Array[String])
  case class EncodedIds(doc_id: Long, n_tokens: Int, ids: Array[Int])

  /** Encode the corpus with a trained merge table. Merge ranks ride one
    * broadcast; the pass is mapPartitions with a bounded per-partition
    * word→tokens memo (Zipf: the memo hit rate is the corpus's
    * type/token ratio). No shuffle — output partitioning follows input.
    */
  def encode(spark: SparkSession, docs: DataFrame, merges: Seq[(String, String)],
             id: String = "doc_id", text: String = "text",
             memoSize: Int = 1 << 16): Dataset[Encoded] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(id).cast("long").as("doc_id"), lower(col(text)).as("text"))
      .as[DocText]
      .mapPartitions { rows =>
        val rank = bc.value
        val memo = new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[String, Array[String]]) =
            size() > memoSize
        }
        rows.map { d =>
          val ws = (if (d.text == null) "" else d.text).split(" ", -1).filter(_.nonEmpty)
          val toks = Array.newBuilder[String]
          var n = 0
          var i = 0
          while (i < ws.length) {
            var enc = memo.get(ws(i))
            if (enc == null) { enc = encodeWord(ws(i), rank); memo.put(ws(i), enc) }
            toks ++= enc
            n += enc.length
            i += 1
          }
          Encoded(d.doc_id, ws.length, n, toks.result())
        }
      }
  }

  /** Token-ID encoding — what the training pipeline actually ships:
    * the same greedy-by-rank segmentation mapped through [[vocab]]
    * (one broadcast for ranks + ids together), OOV characters as -1.
    * Same memo, same zero-shuffle shape as [[encode]].
    */
  def encodeIds(spark: SparkSession, docs: DataFrame, merges: Seq[(String, String)],
                vocabIds: Map[String, Int],
                id: String = "doc_id", text: String = "text",
                memoSize: Int = 1 << 16): Dataset[EncodedIds] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((merges.zipWithIndex.toMap, vocabIds))
    docs.select(col(id).cast("long").as("doc_id"), lower(col(text)).as("text"))
      .as[DocText]
      .mapPartitions { rows =>
        val (rank, ids) = bc.value
        val memo = new java.util.LinkedHashMap[String, Array[Int]](1024, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Int]]) =
            size() > memoSize
        }
        rows.map { d =>
          val ws = (if (d.text == null) "" else d.text).split(" ", -1).filter(_.nonEmpty)
          val out = Array.newBuilder[Int]
          var n = 0
          var i = 0
          while (i < ws.length) {
            var enc = memo.get(ws(i))
            if (enc == null) {
              enc = encodeWord(ws(i), rank).map(t => ids.getOrElse(t, -1))
              memo.put(ws(i), enc)
            }
            out ++= enc
            n += enc.length
            i += 1
          }
          EncodedIds(d.doc_id, n, out.result())
        }
      }
  }
}
