package graft.text

import graft.functions.{SimHash, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines
  * (SURVEY.md §2.4 #36-39). Everything except the rolling fingerprint
  * is a pure built-in-functions plan with a DuckDB oracle.
  */
object TextAnalysis {

  /** Tiny stopword profiles for the language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "un")
  )

  private def words(text: Column): Column = split(lower(text), " ")

  /** Stopword-profile heuristic language ID: count profile-word hits
    * per language, argmax (tie → first language in profile order, i.e.
    * alphabetical; no hits → 'und'). Output: (doc_id, pred_lang,
    * best_hits).
    */
  def languageId(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val ws = words(col(text))
    val withScores = docs.select((col(id) +:
      LangProfiles.map { case (lang, prof) =>
        size(filter(ws, w => w.isInCollection(prof))).as(s"hits_$lang")
      }): _*)
    val hitCols = LangProfiles.map { case (l, _) => col(s"hits_$l") }
    val bestHits = greatest(hitCols: _*)
    val pred = LangProfiles.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"hits_$lang") === bestHits && bestHits > 0, lit(lang)).otherwise(acc)
    }
    withScores.select(col(id), pred.as("pred_lang"), bestHits.as("best_hits"))
  }

  /** Quality signals: length, word count, punctuation ratio, stopword
    * ratio, mean word length (ratios as decimal(10,6) for exact
    * cross-engine compare).
    */
  def qualityScore(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val ws = words(col(text))
    val nWords = size(ws)
    val stopHits = size(filter(ws, w => w.isInCollection(TextFunctions.Stopwords)))
    docs.select(
      col(id),
      length(col(text)).as("n_chars"),
      nWords.as("n_words"),
      round(regexp_count(col(text), lit("[.,;:!?]")).cast("double") /
        length(col(text)).cast("double"), 6).cast("decimal(10,6)").as("punct_ratio"),
      round(stopHits.cast("double") / nWords.cast("double"), 6).cast("decimal(10,6)").as("stop_ratio"),
      round((length(col(text)) - nWords + 1).cast("double") / nWords.cast("double"), 6)
        .cast("decimal(10,6)").as("mean_word_len"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single other non-space chars).
    */
  def tokenCounts(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(
      col(id),
      size(split(col(text), " ")).as("ws_tokens"),
      regexp_count(col(text), lit("[a-zA-Z]+|[0-9]+|[^ a-zA-Z0-9]")).as("re_tokens"))

  /** Per-source adaptive length gate (the FineWeb-style "threshold per
    * subset" discipline): keep documents whose word count reaches their
    * source's exact interpolated q-quantile. The threshold table is one
    * tiny per-source aggregate broadcast back onto the corpus — never a
    * corpus-wide window. Output: (doc_id, source, n_words, thr).
    *
    * `percentile` is exact and buffers per-distinct-VALUE counts, which
    * is safe here because word counts are small integers (buffer ∝ max
    * doc length, not corpus size); for continuous metrics swap in
    * `approx_percentile`, which is mergeable at any scale.
    */
  def perSourceLengthFilter(docs: DataFrame, q: Double = 0.5,
                            id: String = "doc_id", text: String = "text",
                            src: String = "source"): DataFrame = {
    val n = docs.select(col(id), col(src),
      size(split(lower(col(text)), " ")).cast("long").as("n_words"))
    val thr = n.groupBy(src).agg(expr(s"percentile(n_words, $q)").as("thr"))
    n.join(broadcast(thr), Seq(src))
      .where(col("n_words") >= col("thr"))
      .select(col(id), col(src), col("n_words"), col("thr"))
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * cleaned words (SQL-expressible). The sort/distinct runs as one
    * compiled function — interpreted array expressions measured ~3s for
    * 5000 docs.
    */
  def bagFingerprint(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), md5(sortedBagUdf(TextFunctions.cleanedText(col(text)))).as("bag_fp"))

  private val sortedBagUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val distinct = new java.util.TreeSet[String]()
      s.split(' ').foreach(distinct.add)
      String.join(" ", distinct)
    }
  }

  /** Pattern scrubbing for training corpora: mask digit runs (the
    * PII-redaction shape — emails/phones/ids are the same regexp_replace
    * plan with richer patterns).
    */
  def scrubPatterns(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id),
      regexp_replace(col(text), "[0-9]+", "<NUM>").as("scrubbed"))

  /** Repetition / boilerplate signals: distinct-word ratio and the share
    * of the single most frequent word. High top-word share or low
    * distinct ratio flags machine-generated or boilerplate text.
    * Relational shape (explode → two aggregations) rather than per-row
    * array ops, so it is one shuffle at any corpus size.
    * Output: (doc_id, n_words, n_distinct, distinct_ratio, top_share).
    */
  def repetitionRatio(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), explode(words(col(text))).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(id))
      .agg(sum(col("cnt")).as("n_words"), count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col(id), col("n_words"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_words").cast("double"), 6).as("distinct_ratio"),
        round(col("top_cnt").cast("double") / col("n_words").cast("double"), 6).as("top_share"))

  /** The Gopher REPETITION battery (Rae et al. 2021 Table A1's other
    * half — [[gopherRules]] covers the structural rules): per-document
    * duplicate-line fraction and duplicate-line CHARACTER fraction,
    * the character share of the single most frequent word {2,3,4}-gram,
    * and the character share of duplicated word {5..10}-grams. One
    * relational pass per signal family: lines and all nine gram sizes
    * explode once each, count within (doc, gram), and fold back to one
    * row per document — per-doc work only, no corpus-wide state.
    *
    * Deliberate deviation (documented, deterministic): the duplicated
    * n-gram char share counts every occurrence BEYOND THE FIRST at
    * full gram length without de-overlapping occurrences — Gopher's
    * exact overlap accounting needs positional sweep-line state per
    * doc; this shares its fixed points (0 when nothing repeats, large
    * when much does) and is reproducible in SQL.
    * Output: (doc_id, dup_line_frac, dup_line_char_frac,
    * top_{2,3,4}gram_char_frac, dup_{5..10}gram_char_frac) as
    * decimal(10,6).
    */
  def gopherRepetition(docs: DataFrame, id: String = "doc_id",
                       text: String = "text"): DataFrame = {
    def r6(c: Column): Column = round(c, 6).cast("decimal(10,6)")
    val base = docs.select(col(id), col(text).as("__t"),
      length(col(text)).cast("double").as("__chars"))

    // line family: duplicate occurrences of a (trimmed, lowered) line
    val lines = base
      .select(col(id), col("__chars"), explode(split(col("__t"), "\n")).as("line"))
      .select(col(id), col("__chars"), trim(lower(col("line"))).as("norm"),
        length(col("line")).cast("double").as("llen"))
      .where(col("norm") =!= "")
      .groupBy(col(id), col("__chars"), col("norm"))
      // duplicate chars = all occurrences' chars minus the (shortest —
      // a deterministic canonical when raw lengths differ under one
      // normalized form) kept occurrence
      .agg(count(lit(1)).as("c"), sum(col("llen")).as("sl"), min(col("llen")).as("ml"))
      .groupBy(col(id), col("__chars"))
      .agg(sum(col("c")).as("n_lines"),
        sum(col("c") - 1).as("dup_lines"),
        sum(col("sl") - col("ml")).as("dup_line_chars"))
      .select(col(id),
        r6(col("dup_lines").cast("double") / col("n_lines").cast("double"))
          .as("dup_line_frac"),
        r6(col("dup_line_chars") / col("__chars")).as("dup_line_char_frac"))

    // gram families: per n, grams of the lowered space-split words.
    // Measured NOTE: building all nine sizes as one flattened per-row
    // struct array then exploding once was 2-3× SLOWER (20s vs 7s at
    // sf0.1) — higher-order array construction is CodegenFallback and
    // the mega-array materializes ~9× the tokens per row; nine lazy
    // explode branches over the (cached-scan) corpus win, and each
    // per-n aggregation is map-side-combined independently.
    val ws = split(lower(col("__t")), " ")
    def gramsOfN(n: Int): DataFrame = {
      val len = size(ws) - (n - 1)
      // sequence(1, 0) DESCENDS in Spark — short docs need an explicit
      // empty gram list, not a [1, 0] index pair
      val grams = when(len >= 1,
        transform(sequence(lit(1), len), i => concat_ws(" ", slice(ws, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      base.select(col(id), col("__chars"), lit(n).as("n"),
          explode(grams).as("g"))
        .groupBy(col(id), col("__chars"), col("n"), col("g"))
        .agg(count(lit(1)).as("c"))
    }
    val allGrams = (2 to 10).map(gramsOfN).reduce(_ unionByName _)
    val perDocN = allGrams
      .groupBy(col(id), col("__chars"), col("n"))
      .agg(max(col("c") * length(col("g"))).as("top_chars"),
        sum(when(col("c") > 1, (col("c") - 1) * length(col("g")))
          .otherwise(0L)).as("dup_chars"))
    val aggExprs: Seq[Column] =
      (2 to 4).map(n => r6(coalesce(max(when(col("n") === n,
        col("top_chars").cast("double") / col("__chars"))), lit(0.0)))
        .as(s"top_${n}gram_char_frac")) ++
      (5 to 10).map(n => r6(coalesce(max(when(col("n") === n,
        col("dup_chars").cast("double") / col("__chars"))), lit(0.0)))
        .as(s"dup_${n}gram_char_frac"))
    val gramCols = perDocN.groupBy(col(id)).agg(aggExprs.head, aggExprs.tail: _*)

    val outCols = Seq("dup_line_frac", "dup_line_char_frac") ++
      (2 to 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac")
    // spine = EVERY input doc: one with only blank lines and no 2-gram
    // would otherwise vanish from both aggregate sides
    docs.select(col(id)).distinct()
      .join(lines, Seq(id), "left")
      .join(gramCols, Seq(id), "left")
      .select(col(id) +: outCols.map(c =>
        coalesce(col(c), lit(0).cast("decimal(10,6)")).as(c)): _*)
  }

  /** Corpus-wide exact LINE deduplication (the C4 discipline: a line
    * seen anywhere before is dropped — boilerplate navigation, cookie
    * banners and licence footers repeat VERBATIM across pages, and
    * line granularity catches them where document-level dedup cannot).
    * The canonical occurrence of each distinct non-blank normalized
    * line (trim+lower) is its (doc_id, position)-minimal one; every
    * other occurrence is removed and the documents are rebuilt in
    * original line order. Blank lines are structure, not content —
    * always kept. `sep = \"\\n\\n\"` gives the PARAGRAPH-granularity
    * variant Gopher dedups at. ONE window exchange on the normalized line; the
    * rebuild is a per-doc sort of surviving positions, no second
    * corpus pass.
    * Output: (doc_id, n_lines, n_kept, text_clean).
    */
  def lineDedup(docs: DataFrame, id: String = "doc_id", text: String = "text",
                sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(id), posexplode(split(col(text), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
      .withColumn("norm", trim(lower(col("line"))))
      // composite (doc_id, pos) ordering as ONE comparable key so the
      // SQL oracle's arg-min agrees bit-for-bit (positions < 10^9)
      .withColumn("ord", col(id).cast("long") * 1000000000L + col("pos"))
    val w = Window.partitionBy("norm")
    lines
      .withColumn("keep",
        col("norm") === "" || col("ord") === min(col("ord")).over(w))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))),
          e => e.getField("line")), sep).as("text_clean"))
  }

  /** PII signal battery + layered redaction (the C4/CCNet-style
    * pre-training scrub, richer than [[scrubPatterns]]'s digit-run
    * shape): per-doc counts of emails, URLs, IPv4 literals and long
    * digit runs, plus the text with each class masked in detection
    * order (email → URL → IP → digit-run, so an email's digits are
    * masked as <EMAIL>, not shredded into <NUM>). Counts are measured
    * on the ORIGINAL text per class — they are audit signals, not
    * post-scrub leftovers. Pure per-row regex expressions; patterns
    * chosen to mean the same thing to Java regex and RE2 so the
    * DuckDB oracle recomputes them verbatim.
    * Output: (doc_id, n_emails, n_urls, n_ips, n_digit_runs, scrubbed).
    */
  def piiSignals(docs: DataFrame, minDigits: Int = 6,
                 id: String = "doc_id", text: String = "text"): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
    val url = "https?://[^ ]+"
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val digits = s"[0-9]{$minDigits,}"
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col(text), email, "<EMAIL>"),
            url, "<URL>"),
          ip, "<IP>"),
        digits, "<NUM>")
    docs.select(col(id),
      regexp_count(col(text), lit(email)).cast("long").as("n_emails"),
      regexp_count(col(text), lit(url)).cast("long").as("n_urls"),
      regexp_count(col(text), lit(ip)).cast("long").as("n_ips"),
      regexp_count(col(text), lit(digits)).cast("long").as("n_digit_runs"),
      scrubbed.as("scrubbed"))
  }

  /** Composite rule-based quality gate (the Gopher rules, Rae et al.
    * 2021 Table A1, the filter battery MassiveText/RefinedWeb-style
    * pipelines run BEFORE any model-based scoring): word-count bounds,
    * mean word length bounds, symbol-to-word ratio, alphabetic-word
    * ratio, bullet-line and ellipsis-line shares, and required-stopword
    * hits — one row per document with every signal EXPOSED (a pipeline
    * tunes thresholds per corpus; a pass/fail-only view would hide the
    * distribution) plus the conjunction verdict. Pure per-row
    * expressions: no shuffle, no UDF, scales linearly.
    * Output: (doc_id, n_words, mean_word_len, alpha_ratio,
    * symbol_ratio, bullet_ratio, ellipsis_ratio, stop_hits, passes).
    */
  def gopherRules(docs: DataFrame, minWords: Int = 50, maxWords: Int = 100000,
                  stops: Seq[String] = GopherStops, minStopHits: Int = 2,
                  id: String = "doc_id", text: String = "text"): DataFrame = {
    val ws = words(col(text))
    val nWords = size(ws)
    val lines = split(col(text), "\n")
    val nLines = size(lines)
    val stopHits = size(filter(array(stops.map(lit): _*),
      s => array_contains(ws, s)))
    val alphaWords = size(filter(ws, w => w.rlike("[a-z]")))
    val symbolCount = regexp_count(col(text), lit("#|\\.\\.\\.")).cast("double")
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
    val ellipsisLines = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$")))
    def ratio6(c: Column): Column = round(c, 6).cast("decimal(10,6)")
    val meanWordLen = (length(col(text)) - nWords + 1).cast("double") / nWords.cast("double")
    val alphaRatio = alphaWords.cast("double") / nWords.cast("double")
    val symbolRatio = symbolCount / nWords.cast("double")
    val bulletRatio = bulletLines.cast("double") / nLines.cast("double")
    val ellipsisRatio = ellipsisLines.cast("double") / nLines.cast("double")
    docs.select(
      col(id),
      nWords.cast("long").as("n_words"),
      ratio6(meanWordLen).as("mean_word_len"),
      ratio6(alphaRatio).as("alpha_ratio"),
      ratio6(symbolRatio).as("symbol_ratio"),
      ratio6(bulletRatio).as("bullet_ratio"),
      ratio6(ellipsisRatio).as("ellipsis_ratio"),
      stopHits.cast("long").as("stop_hits"),
      (nWords.between(minWords, maxWords) &&
        meanWordLen.between(3.0, 10.0) &&
        alphaRatio > 0.8 &&
        symbolRatio < 0.1 &&
        bulletRatio <= 0.9 &&
        ellipsisRatio <= 0.3 &&
        stopHits >= minStopHits).cast("int").as("passes"))
  }

  /** The Gopher required-stopword list, verbatim (Rae et al. 2021). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Cross-document boilerplate share: the fraction of a document's
    * distinct n-gram shingles that occur in more than `minDf` documents
    * corpus-wide (the C4/CCNet-style signal for template/boilerplate
    * text — repeated spans that are NOT near-duplicate whole docs).
    * Two grouped aggregations over the shingle inverted index; the hot
    * shingle table is tiny (df > minDf) so it broadcasts.
    * Output: (doc_id, n_shingles, n_hot, hot_share).
    */
  /** Per-stratum corpus data card (the summary a dataset release ships
    * and a pipeline operator watches between stages): doc/char/word
    * totals, mean words, language spread, length extrema — ONE grouped
    * aggregation pass, all counts exact longs so the numbers are
    * engine- and shuffle-order-independent.
    */
  def corpusReport(docs: DataFrame, stratum: String = "source",
                   langCol: String = "lang", text: String = "text"): DataFrame = {
    val ws = size(split(col(text), " ")).cast("long")
    docs.groupBy(col(stratum)).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(text)).cast("long")).as("n_chars"),
      sum(ws).as("n_words"),
      round(sum(ws).cast("double") / count(lit(1)), 6).cast("decimal(10,6)").as("avg_words"),
      countDistinct(col(langCol)).as("n_langs"),
      min(length(col(text))).as("min_chars"),
      max(length(col(text))).as("max_chars"))
  }

  def boilerplateShare(docs: DataFrame, n: Int = 3, minDf: Long = 5,
                       id: String = "doc_id", text: String = "text"): DataFrame = {
    val inv = docs
      .select(col(id), graft.dedup.Dedup.shingles(col(text), n).as("sh"))
      .select(col(id), size(col("sh")).as("n_shingles"), explode_outer(col("sh")).as("g"))
    val hot = inv.where(col("g").isNotNull)
      .groupBy("g").agg(countDistinct(col(id)).as("df"))
      .where(col("df") > minDf).select(col("g"), lit(1).as("__hot"))
    inv.join(broadcast(hot), Seq("g"), "left")
      .groupBy(col(id), col("n_shingles"))
      .agg(sum(coalesce(col("__hot"), lit(0))).cast("long").as("n_hot"))
      .withColumn("hot_share",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_hot").cast("double") / col("n_shingles").cast("double"), 6)))
  }

  /** Fixed-size word-window chunking with stride (the RAG / training
    * window split): one output row per (doc, window start), window =
    * `size` words, consecutive starts `stride` apart, last windows may
    * be short. Pure per-row explode — no shuffle at any corpus size.
    * Output: (doc_id, chunk_id, chunk_text, n_words).
    */
  def chunkWords(docs: DataFrame, size: Int, stride: Int,
                 id: String = "doc_id", text: String = "text"): DataFrame = {
    require(size > 0 && stride > 0, s"size ($size) and stride ($stride) must be positive")
    val ws = words(col(text))
    docs
      .select(col(id), ws.as("ws"))
      .select(col(id),
        posexplode(sequence(lit(0), greatest(org.apache.spark.sql.functions.size(col("ws")) - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_id", "start")),
        col("ws"))
      .select(col(id), col("chunk_id"),
        array_join(slice(col("ws"), col("start") + 1, lit(size)), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(slice(col("ws"), col("start") + 1, lit(size))).as("n_words"))
  }

  /** Greedy sequence packing per group: assign whole documents to
    * consecutive fixed-token-budget bins (`maxTokens`), in `orderCol`
    * order within each `groupCol` partition — the data-mixing step that
    * turns documents into training sequences. Bins are per group, so
    * packing parallelizes across groups (the global-order variant is a
    * single sequential stream by definition). bin = ⌊tokens-before /
    * maxTokens⌋: no document is split, and a bin overflows by at most
    * its last document. `orderCol` must be unique within each group —
    * ties would make the prefix sums (and so the packing)
    * nondeterministic. Output: input columns + (n_tokens, bin).
    */
  def packSequences(docs: DataFrame, maxTokens: Long, groupCol: String,
                    orderCol: String, text: String = "text"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", org.apache.spark.sql.functions.size(words(col(text))).cast("long"))
      .withColumn("bin", (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / maxTokens).cast("long"))
  }

  /** Order-sensitive rolling polynomial fingerprint (rows-only): FNV of
    * each word folded with ×31.
    */
  def rollingFingerprint(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val roll = udf { (s: String) =>
      if (s == null) 0L
      else s.split(" ").foldLeft(0L)((acc, w) => acc * 31L + SimHash.fnv1a64(w))
    }
    docs.select(col(id), roll(TextFunctions.cleanedText(col(text))).as("roll_fp"))
  }

  case class CdcChunk(doc_id: Long, chunk_idx: Int, start_word: Int,
                      n_words: Int, chunk_hash: Long)

  /** CONTENT-DEFINED chunking (the FastCDC/rsync idea at word
    * granularity): a chunk boundary falls after word i when the hash
    * of the last `window` words is ≡ 0 mod `avgSize` — the boundary
    * depends only on LOCAL content, so inserting or deleting words
    * early in a document re-aligns within one window and every later
    * chunk (and its hash) is unchanged. Fixed-stride chunking
    * ([[chunkWords]]) shifts every subsequent chunk instead, which is
    * why chunk-hash dedup over CDC chunks catches shifted duplicates
    * that positional chunking misses. `minSize`/`maxSize` clamp the
    * geometric size distribution (classic CDC discipline: min skips
    * the no-cut zone, max forces a cut).
    *
    * Per-row loop, zero shuffles; `chunk_hash` is the ×31-FNV fold of
    * the chunk's words ([[rollingFingerprint]]'s form, so equal word
    * sequences hash equal). Output: (doc_id, chunk_idx, start_word
    * [1-based], n_words, chunk_hash).
    */
  def cdcChunks(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                window: Int = 3, avgSize: Int = 16, minSize: Int = 4, maxSize: Int = 64,
                id: String = "doc_id", text: String = "text"): org.apache.spark.sql.Dataset[CdcChunk] = {
    require(window > 0 && 0 < minSize && minSize <= avgSize && avgSize <= maxSize,
      s"need 0 < minSize <= avgSize <= maxSize and window > 0, got $window/$minSize/$avgSize/$maxSize")
    import spark.implicits._
    docs.select(col(id).cast("long").as("doc_id"), lower(col(text)).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (did, t) =>
          val ws = (if (t == null) "" else t).split(" ", -1).filter(_.nonEmpty)
          val wh = ws.map(SimHash.fnv1a64)
          val out = scala.collection.mutable.ArrayBuffer.empty[CdcChunk]
          var start = 0
          var idx = 0
          var i = 0
          while (i < ws.length) {
            val len = i - start + 1
            // gram hash of the last `window` words, boundary test past minSize
            val cut =
              if (len >= maxSize) true
              else if (len < minSize || i + 1 < window) false
              else {
                var h = -3750763034362895579L
                var j = i - window + 1
                while (j <= i) { h = (h ^ wh(j)) * 1099511628211L; j += 1 }
                java.lang.Long.remainderUnsigned(h, avgSize) == 0L
              }
            if (cut || i == ws.length - 1) {
              var fp = 0L
              var j = start
              while (j <= i) { fp = fp * 31L + wh(j); j += 1 }
              out += CdcChunk(did, idx, start + 1, len, fp)
              idx += 1
              start = i + 1
            }
            i += 1
          }
          out
        }
      }
  }
}
