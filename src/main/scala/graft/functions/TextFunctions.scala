package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning / tokenization, Spark-native.
  *
  * Replicates the reference tokenizer (maco/util.py:11 `get_cleaned_text`)
  * as a pure `org.apache.spark.sql.functions` chain so it stays inside
  * whole-stage codegen (no UDF). The same chain can be emitted as DuckDB
  * SQL (for the correctness oracle) via [[cleanedTextSql]] — both engines
  * use non-overlapping left-to-right regex replacement, so the sequential
  * stopword-removal semantics match exactly.
  */
object TextFunctions {

  /** Stopword list from maco/util.py:14. Order matters: removal is a
    * sequential fold and ` x ` replacement is non-overlapping.
    */
  val Stopwords: Seq[String] = Seq(
    "a", "the", "of", "on", "in", "an", "and", "is", "at", "are", "as",
    "be", "but", "by", "for", "it", "no", "not", "or", "such", "that",
    "their", "there", "these", "to", "was", "with", "they", "will",
    "v", "ve", "d")

  /** maco/util.py:11 — ASCII-fold, non-alnum runs → single space, lower,
    * trim, then sequential stopword strip. Null-safe: null → null.
    */
  def cleanedText(c: Column): Column = {
    val ascii = regexp_replace(c.cast("string"), "[^\\x00-\\x7F]", "")
    val words = lower(regexp_replace(ascii, "[^a-zA-Z0-9]+", " "))
    val base  = trim(words)
    Stopwords.foldLeft(base) { (acc, w) =>
      val mid = regexp_replace(acc, " " + w + " ", " ")
      val hd  = regexp_replace(mid, "^" + w + " ", "")
      regexp_replace(hd, " " + w + "$", "")
    }
  }

  /** Plain-Scala twin of [[cleanedText]] — for oracle-literal generation
    * and row-level code outside the DataFrame layer (same semantics:
    * Java String.replace is left-to-right non-overlapping like Python's).
    */
  def cleanedTextLocal(text: String): String = {
    if (text == null) return null
    val ascii = text.filter(_ < 128)
    val words = ascii.replaceAll("[^a-zA-Z0-9]+", " ").toLowerCase
    var s = words.trim
    for (w <- Stopwords) {
      s = s.replace(" " + w + " ", " ")
      if (s.startsWith(w + " ")) s = s.substring(w.length + 1)
      if (s.endsWith(" " + w)) s = s.substring(0, s.length - w.length - 1)
    }
    s
  }

  /** DuckDB SQL equivalent of [[cleanedText]] applied to SQL expression
    * `expr`. DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all default.
    */
  def cleanedTextSql(expr: String): String = {
    val ascii = s"regexp_replace(CAST($expr AS VARCHAR), '[^\\x00-\\x7F]', '', 'g')"
    val words = s"lower(regexp_replace($ascii, '[^a-zA-Z0-9]+', ' ', 'g'))"
    val base  = s"trim($words)"
    Stopwords.foldLeft(base) { (acc, w) =>
      val mid = s"regexp_replace($acc, ' $w ', ' ', 'g')"
      val hd  = s"regexp_replace($mid, '^$w ', '', 'g')"
      s"regexp_replace($hd, ' $w$$', '', 'g')"
    }
  }
}
