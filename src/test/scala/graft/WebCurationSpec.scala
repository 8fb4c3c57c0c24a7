package graft

import graft.text.WebCuration
import org.apache.spark.sql.functions._

/** Edge vectors for the web-curation battery (the harness rows prove
  * engine-parity on the corpus; these pin the intended behaviors).
  */
class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url").select(WebCuration.urlNormalize(col("url")).as("c"))
      .head().getString(0)

  test("urlNormalize canonical behaviors") {
    // scheme+host lowered, path case preserved
    assert(canon("HTTP://EXAMPLE.com/KeepCase") == "http://example.com/KeepCase")
    // www + default ports dropped; non-default port kept
    assert(canon("https://www.a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    // fragment dropped
    assert(canon("http://a.com/x#section") == "http://a.com/x")
    // tracking params dropped, remainder sorted, values preserved
    assert(canon("http://a.com/x?b=2&utm_source=f&a=1&gclid=z") == "http://a.com/x?a=1&b=2")
    // tracking-only query collapses entirely
    assert(canon("http://a.com/x?utm_campaign=c") == "http://a.com/x")
    // bare-root trailing slash dropped; deeper trailing slash kept
    assert(canon("http://a.com/") == "http://a.com")
    assert(canon("http://a.com/x/") == "http://a.com/x/")
    // valueless tracking param dropped too; empty segments dropped
    assert(canon("http://a.com/x?fbclid&a=1&") == "http://a.com/x?a=1")
    // no scheme: string passes through the steps without a host rewrite
    assert(canon("  not a url  ") == "not a url")
  }

  test("urlNormalize is IDEMPOTENT over a generated vector set") {
    // if canonicalization weren't a fixpoint, URL dedup applied at two
    // different pipeline stages would key the same page differently
    val hosts = Seq("EXAMPLE.com", "www.a.org", "a.b.co:443", "x.io:8080")
    val paths = Seq("", "/", "/P/q", "/P/q/")
    val queries = Seq("", "?utm_source=f", "?b=2&a=1", "?b=2&utm_c=x&a=1", "?fbclid")
    val frags = Seq("", "#s")
    val urls = for {
      h <- hosts; p <- paths; q <- queries; f <- frags
      s <- Seq("http://", "HTTPS://")
    } yield s + h + p + q + f
    val df = urls.toDF("url")
    val once = df.select(WebCuration.urlNormalize(col("url")).as("c"))
    val twice = once.select(WebCuration.urlNormalize(col("c")).as("c2"))
    val pairs = once.collect().map(_.getString(0))
      .zip(twice.collect().map(_.getString(0)))
    val broken = pairs.filter { case (a, b) => a != b }
    assert(broken.isEmpty, s"non-idempotent canon: ${broken.take(5).toSeq}")
  }

  test("htmlExtract on tag-free text is whitespace normalization") {
    val out = WebCuration.htmlExtract(
      Seq((1L, "plain  text\nwith   spaces")).toDF("doc_id", "html")).head()
    assert(out.getAs[String]("text") == "plain text with spaces")
    assert(out.getAs[String]("title") == "")
    assert(out.getAs[Long]("n_links") == 0L)
  }

  test("urlDedup keeps the id-minimal doc per canonical url") {
    val docs = Seq(
      (1L, "http://www.A.com/p?b=2&a=1"),
      (2L, "http://a.com/p?a=1&b=2#frag"),
      (3L, "http://a.com/other")).toDF("doc_id", "url")
    val out = WebCuration.urlDedup(docs).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("canon")).take(2).distinct.length == 1)
    assert(out.map(_.getAs[Boolean]("keep")).toSeq == Seq(true, false, true))
  }

  test("htmlExtract strips blocks/tags, decodes entities in order, counts links") {
    val html = """<html><head><title> A
                 |Title </title><style>p { color: red }</style></head>
                 |<body><!-- secret --><script>if (1 < 2) alert("x")</script>
                 |<p>Hello&nbsp;&quot;World&quot;</p><p>&amp;lt; stays encoded</p>
                 |<a href="1">x</a><A HREF='2'>y</A></body></html>""".stripMargin
    val out = WebCuration.htmlExtract(Seq((1L, html)).toDF("doc_id", "html")).head()
    assert(out.getAs[String]("title") == "A Title")
    val text = out.getAs[String]("text")
    assert(text == "Hello \"World\" &lt; stays encoded x y", text)
    assert(!text.contains("secret") && !text.contains("alert") && !text.contains("color"))
    assert(out.getAs[Long]("n_links") == 2L)
  }

  test("unicodeClean composes NFC, strips controls, keeps tab/newline, counts damage") {
    val docs = Seq(
      (1L, "cafe\u0301 ok"),           // decomposed -> composed
      (2L, "abc\u0001\td\u0002\ne"),  // controls stripped, \t \n kept
      (3L, "caf\u00c3\u00a9 \ufffd x"), // mojibake + replacement counted
      (4L, "plain ascii")).toDF("doc_id", "text")
    val out = WebCuration.unicodeClean(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "caf\u00e9 ok")
    assert(out(0).getAs[Boolean]("changed"))
    assert(out(1).getAs[String]("clean_text") == "abc\td\ne")
    assert(out(1).getAs[Long]("n_ctrl") == 2L)
    assert(out(2).getAs[Long]("n_mojibake") == 1L)
    assert(out(2).getAs[Long]("n_replacement") == 1L)
    assert(out(3).getAs[String]("clean_text") == "plain ascii")
    assert(!out(3).getAs[Boolean]("changed"))
  }

  test("weightedSample: deterministic, k-bounded, zero-weight rows excluded") {
    val docs = (1L to 200L).map(i => (i, if (i % 10 == 0) 0.0 else i.toDouble))
      .toDF("doc_id", "w")
    val a = graft.ops.Sampling.weightedSample(docs, "doc_id", col("w"), 50).collect()
    val b = graft.ops.Sampling.weightedSample(docs, "doc_id", col("w"), 50).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    assert(a.length == 50)
    assert(a.forall(_.getAs[Double]("weight") > 0))
    // heavier ids should be over-represented vs uniform: mean picked id
    // well above the population mean of ~100
    val meanPicked = a.map(_.getLong(0)).sum.toDouble / a.length
    assert(meanPicked > 110.0, s"weighting has no effect? mean=$meanPicked")
  }
}
