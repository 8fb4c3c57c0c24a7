package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus keyword statistics and search scoring (TF-IDF, BM25) — the
  * quality/relevance signals a training-data pipeline derives from raw
  * text at corpus scale.
  *
  * Everything is explode → aggregate: per-doc term frequencies and the
  * document-frequency table are single grouped aggregations (map-side
  * partial), corpus-level scalars (N, avg doc length) ride a broadcast
  * 1-row crossJoin — no driver round-trips, no UDFs in the hot path.
  */
object Search {

  private def words(textCol: String) = split(lower(col(textCol)), " ")

  /** (doc_id, word, tf) — raw per-doc term counts. */
  def termFreq(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), explode(words(text)).as("word"))
      .groupBy(col(id), col("word")).agg(count(lit(1)).as("tf"))

  /** Top-k words per document by TF-IDF (score = tf · ln(N/df)),
    * ranked on the 6-decimal-rounded score, ties by word ascending.
    * Output: (doc_id, word, score).
    */
  def tfidfTopK(docs: DataFrame, k: Int,
                id: String = "doc_id", text: String = "text"): DataFrame = {
    val tf = termFreq(docs, id, text)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    // df as a COUNT WINDOW over tf's word key instead of a second
    // aggregate joined back: the join form executed the whole
    // tokenize+aggregate subplan TWICE (once under the df aggregate,
    // once as the join input) — the dominant corpus pass. The window
    // pays one word-keyed exchange, exactly what the join's sort-merge
    // side would pay anyway once the vocabulary outgrows a broadcast;
    // df values (count per word = docs containing the word, since tf
    // has one row per (doc, word)) and the double arithmetic are
    // identical.
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")).cast("double"))
      .crossJoin(broadcast(n))
      .select(col(id), col("word"),
        round(col("tf") * log(col("n") / col("df")), 6).as("score"))
    // window top-k, not the heap operator: with keys ≈ rows/100 the
    // codegen'd sort beats per-row interpreted heap compares (measured
    // 3.2s vs 14.9s at sf0.1); the heap wins when k·keys ≪ rows (ANN).
    val w = Window.partitionBy(col(id)).orderBy(col("score").desc, col("word").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k).drop("rk")
  }

  /** Corpus-unigram log-probability per document — the language-model
    * quality proxy (low average log-prob = unusual token distribution:
    * boilerplate, gibberish, wrong-language) a pretraining pipeline
    * filters on. P(w) is the word's corpus frequency; score = mean
    * ln P(w) over the doc's words. Two corpus passes (vocabulary
    * counts, then scoring); vocabulary total derives from the count
    * table, not a third pass. Output: (doc_id, n_words, logprob).
    */
  def unigramLogProb(docs: DataFrame,
                     id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id), explode(words(text)).as("word"))
    val counts = toks.groupBy("word").agg(count(lit(1)).cast("double").as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    toks.join(counts, "word").crossJoin(broadcast(total))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"), avg(log(col("cnt") / col("total"))).as("logprob"))
  }

  /** BM25 relevance of every document for a bag of query terms
    * (k1 = 1.2, b = 0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))).
    * Output: (doc_id, score) for docs matching ≥1 term, 6-decimal score.
    *
    * Shuffle-free: the query-term set is small, so per-doc term counts
    * come from ONE compiled tokenize pass per row
    * ([[graft.functions.SearchKernel.termStatsCol]]) — corpus stats
    * (N, avgdl, per-term df) collapse to ONE 1-row aggregate riding a
    * broadcast crossJoin. Two corpus scans total (stats + scoring),
    * zero shuffles; the previous explode form paid four tokenize
    * passes and two shuffles.
    */
  def bm25(docs: DataFrame, terms: Seq[String],
           id: String = "doc_id", text: String = "text",
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = terms.distinct
    require(ts.nonEmpty, "bm25 needs at least one query term")
    val perDoc = docs
      .select(col(id), graft.functions.SearchKernel.termStatsCol(col(text), ts).as("st"))
      .select((col(id) +: col("st")(0).as("dl") +:
        ts.indices.map(i => col("st")(i + 1).as(s"tf_$i"))): _*)
    val statCols = avg(col("dl")).as("avgdl") +:
      ts.indices.map(i => sum((col(s"tf_$i") > 0).cast("double")).as(s"df_$i"))
    val stats = perDoc.agg(count(lit(1)).cast("double").as("n"), statCols: _*)
    def idf(i: Int) =
      log(lit(1.0) + (col("n") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
    val score = ts.indices.map { i =>
      idf(i) * (col(s"tf_$i") * (k1 + 1)) /
        (col(s"tf_$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    perDoc
      .where(ts.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col(id), round(score, 6).as("score"))
  }

  /** TRIGRAM LM scoring with STUPID BACKOFF (Brants et al. 2007 — the
    * CCNet/CC-Net-style perplexity gate): each transition scores
    * S(c | a b) = n3/n2(a,b) when the trigram is in the LM,
    * else α·n2(b,c)/n1(b), else α²·n1(c)/N, else the α²·1/N OOV
    * floor. Unlike [[bigramLogProb]], the LM fits on a SEPARATE
    * corpus (`lm`) — scoring a candidate pool under a trusted-corpus
    * LM is the published filtering recipe, and it keeps the backoff
    * paths live instead of self-corpus-trivial.
    *
    * Plan: three count tables from one lm tokenize (n3 and its two
    * marginals — vocabulary-sized, broadcastable), per-doc trigrams
    * from the array zip, LEFT joins + one CASE per transition, one
    * grouped avg. Docs with <3 words have no transitions and are
    * excluded. Output: (doc_id, n_trigrams, logprob).
    */
  def trigramLogProb(docs: DataFrame, lm: DataFrame, alpha: Double = 0.4,
                     id: String = "doc_id", text: String = "text"): DataFrame = {
    def tris(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select(keep :+ words(text).as("ws"): _*)
      .where(size(col("ws")) >= 3)
      .select(keep ++ Seq(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 2).as("a"),
        slice(col("ws"), lit(2), size(col("ws")) - 2).as("b"),
        slice(col("ws"), lit(3), size(col("ws")) - 2).as("c"))).as("t")): _*)
      .select(keep ++ Seq(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c")): _*)
    val lmTri = tris(lm, Nil)
    val n3 = lmTri.groupBy("a", "b", "c").agg(count(lit(1)).cast("double").as("n3"))
    val n2ab = n3.groupBy("a", "b").agg(sum("n3").as("n2ab"))
    val n2bc = n3.groupBy(col("b").as("b2"), col("c").as("c2"))
      .agg(sum("n3").as("n2bc"))
    val n1 = lm.select(explode(words(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("double").as("n1"))
    // N derives from the vocabulary table (sum of per-word counts =
    // total tokens, exact in doubles far past any corpus size), not
    // from a SECOND full tokenize pass over the LM corpus
    val nTot = n1.agg(sum(col("n1")).as("ntot"))
    val dt = tris(docs, Seq(col(id)))
    val a2 = alpha * alpha
    val scored = dt
      .join(n3, Seq("a", "b", "c"), "left")
      .join(n2ab, Seq("a", "b"), "left")
      .join(n2bc, dt("b") === n2bc("b2") && dt("c") === n2bc("c2"), "left")
      .join(n1.withColumnRenamed("w", "__wb").withColumnRenamed("n1", "n1b"),
        dt("b") === col("__wb"), "left")
      .join(n1.withColumnRenamed("w", "__wc").withColumnRenamed("n1", "n1c"),
        dt("c") === col("__wc"), "left")
      .crossJoin(broadcast(nTot))
      .select(col(id),
        when(col("n3").isNotNull, log(col("n3") / col("n2ab")))
          .when(col("n2bc").isNotNull, log(lit(alpha) * col("n2bc") / col("n1b")))
          .when(col("n1c").isNotNull, log(lit(a2) * col("n1c") / col("ntot")))
          .otherwise(log(lit(a2) / col("ntot"))).as("s"))
    scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_trigrams"), avg(col("s")).as("logprob"))
  }

  /** Bigram-LM quality proxy — the step up from [[unigramLogProb]]:
    * mean ln P(w_i | w_{i-1}) over a document's transitions with
    * add-one smoothing, P = (c(prev,w)+1) / (c(prev)+V). Word-salad
    * scores low even when its unigram distribution looks normal — the
    * signal unigram scoring structurally cannot see.
    *
    * Plan: bigrams come from zipping the word array with its own tail
    * (pure per-row expressions — no window, no positional self-join);
    * the bigram count table feeds BOTH c(prev,w) and c(prev) (a
    * second grouped pass over the counts, not the corpus) and V rides
    * a 1-row broadcast. Docs with <2 words have no transitions and are
    * excluded. Output: (doc_id, n_bigrams, logprob).
    */
  def bigramLogProb(docs: DataFrame,
                    id: String = "doc_id", text: String = "text"): DataFrame = {
    val bi = docs
      .select(col(id), words(text).as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col(id), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("prev"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w"))).as("b"))
      .select(col(id), col("b.prev").as("prev"), col("b.w").as("w"))
    val v = docs.select(explode(words(text)).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))
    // c(prev,w) and c(prev) as COUNT WINDOWS over the bigram stream
    // instead of two aggregates joined back: the join form executed
    // the whole bigram subplan TWICE (under the c2 aggregate and as
    // the join input) — the corpus pass is the cost. One exchange
    // (hash by prev satisfies both windows' clustering; one sort by
    // (prev, w) serves both) replaces the two join shuffles; counts
    // are identical (c1 = bigram rows per prev = the old sum of c2).
    bi
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("prev", "w")).cast("double"))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("prev")).cast("double"))
      .crossJoin(broadcast(v))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("c2") + 1.0) / (col("c1") + col("v")))).as("logprob"))
  }
}
