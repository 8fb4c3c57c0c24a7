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

  /** Size-variant vectors generated from the reference
    * generate_XASH(hash_size ∈ {64, 256, 512}) — maco/util.py:173's
    * segment_size_dict path.
    */
  val sizedVectors: Seq[(Int, String, BigInt)] = Seq(
    (64, "hello", BigInt("40091200000", 16)),
    (64, "germany", BigInt("100305100000", 16)),
    (64, "a", BigInt("4000001000", 16)),
    (64, "42", BigInt("80000000a0", 16)),
    (64, "customer 042", BigInt("20000202b0000", 16)),
    (64, "x" * 40, BigInt("4000000004000", 16)),
    (256, "hello", BigInt("800000000040000400000100008000000000000000000000000000000", 16)),
    (256, "germany", BigInt("2000000002020000000008008000040000000000000000000000000000", 16)),
    (256, "a", BigInt("80000000000000000000000000000000000001000000000000000000", 16)),
    (256, "42", BigInt("100000000000000000000000000000000000000000000080200000000", 16)),
    (256, "customer 042", BigInt("40000000000000000001000000000010020010200000000000000000000", 16)),
    (256, "x" * 40, BigInt("1000000000000000000000000000000000000000000000000000800000", 16)),
    (512, "hello", BigInt("40000000000000000010000000000200000000000000800000000400000000000000000000000000000000000000000000000000000000000000000000", 16)),
    (512, "germany", BigInt("100000000000000200010000000000000000000020000010000000000040000000000000000000000000000000000000000000000000000000000000000", 16)),
    (512, "a", BigInt("4000000000000000000000000000000000000000000000000000000000000000000000000000000004000000000000000000000000000000000000000", 16)),
    (512, "42", BigInt("8000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000001000010000000000000000000", 16)),
    (512, "customer 042", BigInt("2000000000000000000000000000000000080000000000000000000000200000100000010004000000000000000000000000000000000000000000000000", 16)),
    (512, "x" * 40, BigInt("400000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000400000000000000000000000000", 16))
  )

  test("xashBig size variants match reference vectors (64/256/512)") {
    sizedVectors.foreach { case (hs, tok, expected) =>
      assert(Xash.xashBig(tok, hs) == expected, s"hash_size=$hs token '$tok'")
    }
  }

  test("word form round-trips and containment holds for every size") {
    for (hs <- Seq(64, 128, 256, 512)) {
      val toks = Seq("hello", "germany", "customer 042")
      val sk = Xash.superKeyWords(toks, hs)
      toks.foreach { t =>
        val w = Xash.xashWords(t, hs)
        // round trip words → BigInt
        val rt = w.zipWithIndex.map { case (x, i) => (BigInt(x) & Mask64) << (i * 64) }
          .foldLeft(BigInt(0))(_ | _)
        assert(rt == Xash.xashBig(t, hs), s"hash_size=$hs token '$t'")
        assert(Xash.containsWords(sk, w), s"superkey must contain member, hs=$hs '$t'")
      }
      assert(!Xash.containsWords(Xash.xashWords("hello", hs), Xash.xashWords("germany", hs)))
    }
  }
}
