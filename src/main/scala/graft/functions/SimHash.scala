package graft.functions

import org.apache.spark.sql.functions.udf

/** SimHash over character 3-grams (reference: maco/util.py:250
  * generate_Simhash).
  *
  * Deviation (SURVEY.md §3): 64-bit with an FNV-1a feature hash instead
  * of the reference's 128-bit md5-based `simhash` library — a 64-bit
  * fingerprint packs into one long column (native comparisons, hamming
  * distance via `bit_count(a ^ b)`) which is what a 100 TB near-dup
  * pass needs. Pinned by unit vectors, checked rows-only by the driver.
  */
object SimHash {
  val Width = 3

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** maco/util.py:270 feature extraction: lowercase, strip non-word,
    * then all 3-grams (the whole string if shorter).
    */
  def features(text: String): Seq[String] = {
    val t = text.toLowerCase.replaceAll("[^\\w]+", "")
    if (t.length <= Width) Seq(t)
    else (0 to t.length - Width).map(i => t.substring(i, i + Width))
  }

  def simhash64(text: String): Long = {
    if (text == null) return 0L
    val v = new Array[Long](64)
    features(text).foreach { f =>
      val h = fnv1a64(f)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (v(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  val simhashUdf = udf((s: String) => simhash64(s))
}
