package graft

import graft.text.{Dsir, TextAnalysis}
import org.apache.spark.sql.functions.col

/** DSIR importance resampling and the Gopher rule battery. */
class DsirSpec extends SparkSpec {

  test("dsir upweights target-like documents and resamples them first") {
    val s = spark
    import s.implicits._
    // target speaks "alpha beta"; raw mixes target-like and unlike docs
    val target = (1 to 20).map(i => (100L + i, s"alpha beta alpha beta gamma $i"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta gamma one"),
      (2L, "alpha beta gamma alpha beta two"),
      (3L, "delta epsilon zeta eta theta iota"),
      (4L, "kappa lambda mu nu xi omicron")
    ).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1) > w(3) && w(1) > w(4) && w(2) > w(3),
      s"target-like docs must outweigh unlike ones: $w")
    val top2 = Dsir.resample(raw, target, k = 2).collect().map(_.getLong(0)).toSet
    assert(top2 == Set(1L, 2L), s"resample must pick the target-like docs, got $top2")
  }

  test("dsir weights are deterministic and n_feats = 2*words - 1") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r1 = Dsir.importanceWeights(docs, docs).collect()(0)
    val r2 = Dsir.importanceWeights(docs, docs).collect()(0)
    assert(r1.getLong(1) == 7) // 4 unigrams + 3 bigrams
    assert(r1.getDouble(2) == r2.getDouble(2))
    // identical corpora: every bucket ratio is 1 -> logweight 0
    assert(math.abs(r1.getDouble(2)) < 1e-6)
  }

  test("DsirKernel.featureBuckets is bit-identical to the relational md5 form") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // adversarial shapes: trailing/leading/double spaces (Spark's split
    // keeps empty tokens), unicode case, single word, empty text, null
    val docs = Seq(
      (1L, "Alpha beta GAMMA delta"),
      (2L, "trailing space "),
      (3L, " leading"),
      (4L, "double  space"),
      (5L, "one"),
      (6L, ""),
      (7L, null.asInstanceOf[String]),
      (8L, "Größe STRASSE İstanbul"),
      (9L, "a b c d e f g h i j k")
    ).toDF("doc_id", "text")
    val buckets = 8192
    // the pre-kernel relational form, verbatim
    val ws = split(lower(col("text")), " ")
    val bigrams = zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val relational = docs
      .select(col("doc_id"), posexplode(concat(ws, bigrams)).as(Seq("i", "f")))
      .select(col("doc_id"), col("i"),
        (conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long") % buckets).as("b"))
    val kernel = docs
      .select(col("doc_id"),
        posexplode(graft.functions.DsirKernel.featureBucketsCol(col("text"), buckets))
          .as(Seq("i", "b")))
    val a = relational.orderBy("doc_id", "i").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val b = kernel.orderBy("doc_id", "i").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == b, s"kernel diverges from the relational form:\n$a\nvs\n$b")
    assert(a.nonEmpty && a.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L))
  }

  test("gopher rules gate on each signal") {
    val s = spark
    import s.implicits._
    val good = ("good words flow nicely here " * 12) + "the and of it"
    val docs = Seq(
      (1L, good),                                // passes
      (2L, "too short"),                         // word-count floor
      (3L, ("# # # " * 30) + good),              // symbol ratio
      (4L, (1 to 70).map(_ => "ab").mkString(" ")) // mean word length < 3
    ).toDF("doc_id", "text")
    val byId = TextAnalysis.gopherRules(docs, minWords = 50, minStopHits = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(8)).toMap
    assert(byId == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0), s"got $byId")
  }

  test("lineDedup drops repeated lines corpus-wide, keeps first occurrences and blanks") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha\ncookie banner\nbeta"),
      (2L, "cookie banner\ngamma\n\ndelta"),
      (3L, "COOKIE BANNER  \nunique")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 3L, "alpha\ncookie banner\nbeta")))
    // the banner's canonical occurrence is (1, pos 1); doc 2 loses it
    // but keeps its BLANK line (structure, not content)
    assert(got(2L) == ((4L, 3L, "gamma\n\ndelta")))
    // normalization (trim + lower) matches the banner variant too
    assert(got(3L) == ((2L, 1L, "unique")))

    // paragraph granularity: the same machinery over "\n\n" units
    val paras = Seq(
      (1L, "intro text\n\nshared footer"),
      (2L, "other body\n\nshared footer")
    ).toDF("doc_id", "text")
    val p = TextAnalysis.lineDedup(paras, sep = "\n\n").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(p(1L) == "intro text\n\nshared footer")
    assert(p(2L) == "other body")
  }

  test("gopher repetition battery: dup lines, top n-gram and dup n-gram char shares") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e a b c d e x"), // repeated 5-gram + repeated 2-grams
      (2L, "x\ny\nx\nx"),            // line 'x' three times
      (3L, "all words unique here"),
      (4L, "\n \n")                  // blank-only: must still get a row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def d(r: org.apache.spark.sql.Row, c: String): Double =
      r.getDecimal(r.fieldIndex(c)).doubleValue()
    // doc 1: len 21; top 2-gram 'a b' ×2 -> 6/21; dup 5-gram
    // 'a b c d e' second occurrence -> 9/21
    assert(math.abs(d(got(1L), "top_2gram_char_frac") - 6.0 / 21) < 1e-6)
    assert(math.abs(d(got(1L), "dup_5gram_char_frac") - 9.0 / 21) < 1e-6)
    assert(d(got(1L), "dup_line_frac") == 0.0) // one line, no dups
    // doc 2: 4 lines, 'x' ×3 -> dup_line_frac 2/4; dup chars 2/7
    assert(math.abs(d(got(2L), "dup_line_frac") - 0.5) < 1e-6)
    assert(math.abs(d(got(2L), "dup_line_char_frac") - 2.0 / 7) < 1e-6)
    // doc 3: nothing repeats
    assert(d(got(3L), "dup_5gram_char_frac") == 0.0)
    assert(d(got(3L), "dup_line_frac") == 0.0)
    // doc 4: blank-only, everything zero but the row exists
    assert(got.contains(4L) && d(got(4L), "dup_line_frac") == 0.0)
  }

  test("lineDedup laws: idempotent, and kept lines = distinct norms + blanks") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocabLines = Vector("alpha beta", "shared banner", "gamma", "  SHARED BANNER",
      "", "delta eps", "zeta")
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(6))(vocabLines(rnd.nextInt(vocabLines.size)))
        .mkString("\n"))
    }.toDF("doc_id", "text")
    val once = TextAnalysis.lineDedup(docs)
    // law 1: kept = distinct non-blank normalized lines + blank lines
    val lines = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), "\n")).as("l"))
    val blanks = lines.where(org.apache.spark.sql.functions.trim(col("l")) === "").count()
    val distinctNorms = lines
      .select(org.apache.spark.sql.functions.trim(
        org.apache.spark.sql.functions.lower(col("l"))).as("n"))
      .where(col("n") =!= "").distinct().count()
    val kept = once.agg(org.apache.spark.sql.functions.sum("n_kept")).head().getLong(0)
    assert(kept == blanks + distinctNorms, s"$kept vs $blanks + $distinctNorms")
    // law 2: idempotence — a second pass keeps everything
    val again = TextAnalysis.lineDedup(
      once.select(col("doc_id"), col("text_clean").as("text")))
    assert(again.where(col("n_kept") =!= col("n_lines")).count() == 0)
  }

  test("trigram stupid-backoff: LM-matching docs outscore OOV; backoff paths fire") {
    val s = spark
    import s.implicits._
    val lm = Seq((100L, "the cat sat on the mat the cat ran")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"), // all trigrams in the LM
      (2L, "the cat ran on the mat"), // 'cat ran on' backs off to bigram/unigram
      (3L, "zq qz zz xq qq xx")       // fully OOV: the floor, finite score
    ).toDF("doc_id", "text")
    val got = graft.text.Search.trigramLogProb(docs, lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L), s"got $got")
    assert(!got(3L).isNaN && !got(3L).isInfinite)
    // the in-LM doc's transitions are all seen: score = mean ln(n3/n2)
    assert(got(1L) > math.log(0.4), s"seen trigrams must not pay backoff: ${got(1L)}")
  }

  test("gopher bullet/ellipsis line shares use line structure") {
    val s = spark
    import s.implicits._
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val df = Seq((1L, bullets)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(df).collect()(0)
    assert(r.getDecimal(5).doubleValue() == 1.0) // bullet_ratio
    assert(r.getInt(8) == 0)
  }
}
