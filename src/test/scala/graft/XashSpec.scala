package graft

import graft.functions.Xash

/** Bit-exactness vectors generated from the reference implementation
  * (maco/util.py:141 generate_XASH, hash_size=128).
  */
class XashSpec extends SparkSpec {
  val Mask64: BigInt = (BigInt(1) << 64) - 1
  val vectors: Seq[(String, BigInt)] = Seq(
    "hello" -> BigInt("83726420746696577807543097488310272"),
    "customer 42" -> BigInt("5318210057668627356355130189917716544"),
    "a" -> BigInt("5192296858534827628531046085033984"),
    "zz top" -> BigInt("166153499473114484112976501010858256"),
    "12345" -> BigInt("83076749736557242061310674144854016"),
    "spark engine" -> BigInt("10633823966279931446140263797971484673"),
    "x" * 20 -> BigInt("20769187434139310514121985316882432"),
    "the quick brown fox" -> BigInt("10384593717069812352749094502924288"),
    "0" -> BigInt("5192296858534827628530496329220608"),
    "nan" -> BigInt("20769189910019389089386134742499328"),
    " " -> BigInt(0),
    "" -> BigInt(0),
    "germany" -> BigInt("332307079412935984685476948100514064"),
    "europe" -> BigInt("166153499511800110340644016127742096"),
    "automobile" -> BigInt("2658461379084882715782570481553514498"),
    "q7 7q" -> BigInt("83076749736557242200603137933312008")
  )

  test("xashBig matches reference vectors") {
    vectors.foreach { case (tok, expected) =>
      assert(Xash.xashBig(tok) == expected, s"token '$tok'")
    }
  }

  test("xash128 hi/lo round-trips the 128-bit value") {
    vectors.foreach { case (tok, expected) =>
      val (hi, lo) = Xash.xash128(tok)
      val rt = ((BigInt(hi) & Mask64) << 64) | (BigInt(lo) & Mask64)
      assert(rt == expected, s"token '$tok'")
    }
  }

  test("fast long-pair path matches BigInt reference on random tokens") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    (0 until 2000).foreach { _ =>
      val len = 1 + rnd.nextInt(40)
      val tok = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val (hi, lo) = Xash.xash128(tok)
      val rt = ((BigInt(hi) & Mask64) << 64) | (BigInt(lo) & Mask64)
      assert(rt == Xash.xashBig(tok), s"token '$tok'")
    }
  }

  test("superKey is OR of member hashes") {
    val (hi, lo) = Xash.superKey(Seq("hello", "germany"))
    val expected = Xash.xashBig("hello") | Xash.xashBig("germany")
    val rt = ((BigInt(hi) & Mask64) << 64) | (BigInt(lo) & Mask64)
    assert(rt == expected)
  }
}
