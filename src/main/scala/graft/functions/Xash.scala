package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{bitwise_not, udf}

/** XASH — 128-bit token hash used for MATE super keys.
  *
  * Bit-exact re-implementation of maco/util.py:141 `generate_XASH`
  * (hash_size=128, number_of_ones=5, rotation=true): the 5 least
  * frequent characters of the token each set one bit in a 111-bit hash
  * segment (position = charIndex*3 + tercile of the char's mean
  * position), the segment is bit-rotated by a length-dependent amount,
  * and bit `111 + len(token) % 17` encodes the token length.
  *
  * The 128-bit value is carried as two longs `(hi, lo)` — bitwise
  * containment checks (MATE's pre-filter) then stay native long ops
  * inside codegen instead of string/bitset work.
  */
object Xash {
  /** `' 0'..'9','a'..'z'` — 37-char alphabet, maco/util.py:171. */
  private val Alphabet = " 0123456789abcdefghijklmnopqrstuvwxyz"
  private val SegmentSize = 3          // 128-bit → 3 bits per char
  private val LengthBitStart = 111     // 37 * 3
  private val LengthMod = 128 - LengthBitStart // 17

  /** 128-bit XASH of a cleaned token. */
  def xashBig(token: String): BigInt = {
    if (token == null || token == "" || token == "None" || token == " " || token == "''")
      return BigInt(0)

    // 5 least frequent chars, ties broken by codepoint (ascending).
    val counts = token.groupBy(identity).map { case (c, s) => (c, s.length) }
    val selected = counts.toSeq.sortBy { case (c, n) => (n, c) }.take(5).map(_._1)

    var result = BigInt(0)
    val tokenSize = token.length
    for (c <- selected) {
      val ci = Alphabet.indexOf(c)
      if (ci >= 0) {
        var sum = 0; var n = 0; var i = 0
        while (i < tokenSize) {
          if (token.charAt(i) == c) { sum += i; n += 1 }
          i += 1
        }
        val meanIndex = sum.toDouble / n
        var location = -1
        var s = 0
        while (s < SegmentSize && location < 0) {
          if (meanIndex <= ((s + 1) * tokenSize).toDouble / SegmentSize)
            location = ci * SegmentSize + s
          s += 1
        }
        result = result | (BigInt(1) << location)
      }
    }

    // Rotation normalized by the length-bit position (maco/util.py:195).
    val d = (LengthBitStart * (tokenSize % LengthMod)) / LengthMod
    val x = result << d
    val y = result >> (LengthBitStart - d)
    result = (x | y) & ((BigInt(1) << LengthBitStart) - 1)

    result | (BigInt(1) << (LengthBitStart + tokenSize % LengthMod))
  }

  /** (hi, lo) long pair of the 128-bit hash. */
  def xash128(token: String): (Long, Long) = {
    val b = xashBig(token)
    ((b >> 64).toLong, b.toLong)
  }

  /** Row super key: bitwise OR of the XASH of every cell in the row
    * (maco/data_handler.py:281).
    */
  def superKey(tokens: Seq[String]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    tokens.foreach { t =>
      val (h, l) = xash128(t)
      hi |= h; lo |= l
    }
    (hi, lo)
  }

  /** Column form: string → struct(hi, lo). */
  val xashUdf = udf((s: String) => xash128(s))

  /** Column form: array<string> → struct(hi, lo) row super key. */
  val superKeyUdf = udf((ts: Seq[String]) => superKey(ts))

  /** MATE pre-filter: query super key bits ⊆ row super key bits.
    * Pure long ops — stays in codegen.
    */
  def contains(rowHi: Column, rowLo: Column, qHi: Column, qLo: Column): Column =
    (qHi.bitwiseAND(bitwise_not(rowHi)) === 0L) && (qLo.bitwiseAND(bitwise_not(rowLo)) === 0L)
}
