package graft.text

import graft.functions.UnicodeKernel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: HTML → text extraction, Unicode
  * normalization/cleanup, and URL canonicalization + URL-level dedup —
  * the steps a Common-Crawl-style pipeline runs BEFORE the text-quality
  * battery ([[TextAnalysis]]) ever sees a document.
  *
  * Every operator is a pure per-row expression chain (zero shuffles
  * except urlDedup's one window exchange), and every regex is chosen to
  * mean the same thing to Java regex (Spark) and RE2 (the DuckDB
  * oracle): no lookahead, no backrefs, explicit character classes —
  * the same cross-engine discipline as `TextAnalysis.piiSignals`.
  */
object WebCuration {

  // ---------------------------------------------------------------- html

  private val HeadPat = "(?is)<head[^>]*>.*?</head>"
  private val ScriptPat = "(?is)<script[^>]*>.*?</script>"
  private val StylePat = "(?is)<style[^>]*>.*?</style>"
  private val CommentPat = "(?s)<!--.*?-->"
  private val TagPat = "(?s)<[^>]*>"
  private val TitlePat = "(?is)<title[^>]*>(.*?)</title>"
  private val LinkPat = "(?i)<a[ >]"

  /** HTML → text: drop the head (title/meta are not body text) plus
    * script/style/comment blocks, strip tags, decode
    * the five core entities (`&amp;` LAST so `&amp;lt;` decodes to the
    * literal `&lt;`, not `<`), collapse whitespace. Also surfaces the
    * `<title>` and the anchor count (the link-density quality signal).
    * Output: (id, title, text, n_links).
    */
  def htmlExtract(docs: DataFrame, id: String = "doc_id",
                  html: String = "html"): DataFrame = {
    val h = col(html)
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
      HeadPat, " "), CommentPat, " "), ScriptPat, " "), StylePat, " ")
    val noTags = regexp_replace(noBlocks, TagPat, " ")
    val decoded = replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" "))
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    docs.select(col(id),
      trim(regexp_replace(regexp_extract(h, TitlePat, 1), "\\s+", " ")).as("title"),
      trim(regexp_replace(amp, "\\s+", " ")).as("text"),
      regexp_count(h, lit(LinkPat)).cast("long").as("n_links"))
  }

  /** DuckDB twin of [[htmlExtract]] over a table with (id, html). */
  def htmlExtractSql(table: String, id: String = "doc_id",
                     html: String = "html"): String = {
    def re(expr: String, pat: String, repl: String) =
      s"regexp_replace($expr, '$pat', '$repl', 'g')"
    val noBlocks = re(re(re(re(html, HeadPat, " "), CommentPat, " "), ScriptPat, " "), StylePat, " ")
    val noTags = re(noBlocks, TagPat, " ")
    val decoded = s"replace(replace(replace(replace(replace($noTags, " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), '&nbsp;', ' ')"
    val amp = s"replace($decoded, '&amp;', '&')"
    s"""SELECT $id,
       | trim(${re(s"regexp_extract($html, '$TitlePat', 1)", "\\s+", " ")}) AS title,
       | trim(${re(amp, "\\s+", " ")}) AS text,
       | CAST(len(regexp_extract_all($html, '$LinkPat')) AS BIGINT) AS n_links
       |FROM $table""".stripMargin
  }

  // ------------------------------------------------------------- unicode

  private val CtrlPat = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  // the classic UTF-8-read-as-Latin-1 digraphs, printable forms only
  // (explicit alternation, not byte-range classes, so the pattern embeds
  // identically in Scala source and SQL string literals)
  private val MojibakePat = "(Ã©|Ã¨|Ã¡|Ã¤|Ã¶|Ã¼|Ã±|Ã§|Â£|Â°)"

  /** Unicode hygiene: NFC-normalize (combining sequences compose, so
    * visually-identical strings hash identically downstream), strip
    * control characters (tab/newline kept), and surface the damage
    * signals measured on the ORIGINAL text — U+FFFD replacement chars
    * (a decoder already gave up) and classic UTF-8-as-Latin-1 mojibake
    * digraphs (Ã©-style). Output: (id, clean_text, n_ctrl,
    * n_replacement, n_mojibake, changed).
    */
  def unicodeClean(docs: DataFrame, id: String = "doc_id",
                   text: String = "text"): DataFrame = {
    val t = col(text)
    val cleaned = regexp_replace(UnicodeKernel.nfcCol(t), CtrlPat, "")
    docs.select(col(id),
      cleaned.as("clean_text"),
      regexp_count(t, lit(CtrlPat)).cast("long").as("n_ctrl"),
      regexp_count(t, lit("�")).cast("long").as("n_replacement"),
      regexp_count(t, lit(MojibakePat)).cast("long").as("n_mojibake"),
      (cleaned =!= t).as("changed"))
  }

  /** DuckDB twin of [[unicodeClean]] over a table with (id, text). */
  def unicodeCleanSql(table: String, id: String = "doc_id",
                      text: String = "text"): String =
    s"""SELECT $id,
       | regexp_replace(nfc_normalize($text), '$CtrlPat', '', 'g') AS clean_text,
       | CAST(len(regexp_extract_all($text, '$CtrlPat')) AS BIGINT) AS n_ctrl,
       | CAST(len(regexp_extract_all($text, chr(65533))) AS BIGINT) AS n_replacement,
       | CAST(len(regexp_extract_all($text, '$MojibakePat')) AS BIGINT) AS n_mojibake,
       | regexp_replace(nfc_normalize($text), '$CtrlPat', '', 'g') <> $text AS changed
       |FROM $table""".stripMargin

  // ----------------------------------------------------------------- url

  private val SchemeHostPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
  private val TrackingPat = "^(utm_[^=]*|gclid|fbclid)(=|$)"

  /** Canonicalize a URL for dedup (the RefinedWeb/CCNet discipline —
    * URL-level exact dedup runs before any content hash, and without
    * canonicalization `HTTP://WWW.X.COM/p?b=2&a=1#s` and
    * `http://x.com/p?a=1&b=2` count as different pages):
    * lowercase scheme+host, drop `www.`, drop the fragment, drop
    * default ports, drop tracking params (utm_ prefixed, gclid,
    * fbclid), SORT the
    * surviving query params, drop a bare-root trailing slash. Pure
    * string expressions; path case and param VALUES are preserved.
    */
  def urlNormalize(url: Column): Column = {
    val u0 = trim(url)
    val noFrag = regexp_replace(u0, "#.*$", "")
    val head = regexp_extract(noFrag, SchemeHostPat, 0)
    val lowered = when(head === "", noFrag)
      .otherwise(concat(lower(head), substr(noFrag, length(head) + 1)))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/?#]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#]*):443([/?#].*)?$", "$1$2")
    val q = regexp_extract(noPort, "\\?(.*)$", 1)
    val base = regexp_replace(noPort, "\\?.*$", "")
    val kept = array_sort(filter(split(q, "&"),
      p => !(p.rlike(TrackingPat)) && p =!= ""))
    val rebuilt = when(q === "" || size(kept) === 0, base)
      .otherwise(concat(base, lit("?"), array_join(kept, "&")))
    regexp_replace(rebuilt, "^(https?://[^/?#]+)/$", "$1")
  }

  /** DuckDB twin of [[urlNormalize]] applied to SQL expression `e`. */
  def urlNormalizeSql(e: String): String = {
    val u0 = s"trim($e)"
    val noFrag = s"regexp_replace($u0, '#.*$$', '', 'g')"
    val head = s"regexp_extract($noFrag, '$SchemeHostPat')"
    val lowered = s"(CASE WHEN $head = '' THEN $noFrag " +
      s"ELSE lower($head) || substr($noFrag, length($head) + 1) END)"
    val noWww = s"regexp_replace($lowered, '^(https?://)www\\.', '\\1')"
    val noPort = s"regexp_replace(regexp_replace($noWww, " +
      s"'^(http://[^/?#]*):80([/?#].*)?$$', '\\1\\2'), " +
      s"'^(https://[^/?#]*):443([/?#].*)?$$', '\\1\\2')"
    val q = s"regexp_extract($noPort, '\\?(.*)$$', 1)"
    val base = s"regexp_replace($noPort, '\\?.*$$', '', 'g')"
    val kept = s"list_sort(list_filter(string_split($q, '&'), " +
      s"p -> NOT regexp_matches(p, '$TrackingPat') AND p <> ''))"
    val rebuilt = s"(CASE WHEN $q = '' OR len($kept) = 0 THEN $base " +
      s"ELSE $base || '?' || array_to_string($kept, '&') END)"
    s"regexp_replace($rebuilt, '^(https?://[^/?#]+)/$$', '\\1')"
  }

  /** URL-level dedup: canonicalize, then keep the (id-minimal) first
    * document per canonical URL. ONE window exchange on the canonical
    * key — the cheapest dedup a web corpus gets, which is why pipelines
    * run it first. Output: (id, url, canon, keep).
    */
  def urlDedup(docs: DataFrame, id: String = "doc_id",
               url: String = "url"): DataFrame = {
    val canon = urlNormalize(col(url))
    docs.select(col(id), col(url), canon.as("canon"))
      .withColumn("keep",
        col(id) === min(col(id)).over(Window.partitionBy(col("canon"))))
  }
}
