package graft

import graft.functions.{BloomHash, SimHash, TextFunctions, Xash}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized laws for the hash kernels (seeded, deterministic) — these
  * are what the discovery prefilters rely on at any scale, so they are
  * pinned over many random inputs, not just hand vectors:
  * - super keys are monotone under token-set growth (no false
  *   negatives in the MATE containment prefilter)
  * - order/duplication insensitivity of the row hashes
  * - cleaned text is idempotent
  * - the (hi,lo) long pair tracks the BigInt reference bit-for-bit
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val chars = "abcdefghijklmnopqrstuvwxyz0123456789 !@#$%^&*()-_=+[]{};:'\",.<>/?\\|`~"

  private def randToken(): String = {
    val n = rnd.nextInt(13)
    Array.fill(n)(chars(rnd.nextInt(chars.length))).mkString
  }

  private def randTokens(): List[String] =
    List.fill(rnd.nextInt(9))(randToken())

  test("XASH super key of a subset is contained in the superset's key") {
    for (_ <- 1 to 500) {
      val a = randTokens(); val extra = randTokens()
      val (ah, al) = Xash.superKey(a)
      val (bh, bl) = Xash.superKey(a ++ extra)
      assert((ah & bh) == ah && (al & bl) == al, s"a=$a extra=$extra")
    }
  }

  test("Bloom row hash of a subset is contained in the superset's hash") {
    for (_ <- 1 to 500) {
      val a = randTokens(); val extra = randTokens()
      val (ah, al) = BloomHash.rowHash(a)
      val (bh, bl) = BloomHash.rowHash(a ++ extra)
      assert((ah & bh) == ah && (al & bl) == al, s"a=$a extra=$extra")
    }
  }

  test("super keys are order- and duplication-insensitive") {
    for (_ <- 1 to 500) {
      val a = randTokens()
      assert(Xash.superKey(a.reverse) == Xash.superKey(a))
      assert(Xash.superKey(a ++ a) == Xash.superKey(a))
      assert(BloomHash.rowHash(a.reverse) == BloomHash.rowHash(a))
      assert(BloomHash.rowHash(a ++ a) == BloomHash.rowHash(a))
    }
  }

  test("cleaned text is idempotent") {
    for (_ <- 1 to 1000) {
      val s = randToken()
      val once = TextFunctions.cleanedTextLocal(s)
      assert(TextFunctions.cleanedTextLocal(once) == once, s"input=${s.toList}")
    }
  }

  test("xash128 (hi,lo) tracks the BigInt reference on random tokens") {
    val mask = (BigInt(1) << 64) - 1
    for (_ <- 1 to 1000) {
      val cleaned = TextFunctions.cleanedTextLocal(randToken())
      val (hi, lo) = Xash.xash128(cleaned)
      val big = ((BigInt(hi) & mask) << 64) | (BigInt(lo) & mask)
      assert(big == Xash.xashBig(cleaned), s"token=$cleaned")
    }
  }

  test("BPE greedy encode is lossless and fully merged under ANY merge table") {
    // losslessness is structural (a merge replaces (l, r) with l+r), so
    // it must hold for arbitrary — even incoherent — merge tables; the
    // fixpoint law says no adjacent output pair is still mergeable
    val alpha = "ab"
    def tok() = Array.fill(1 + rnd.nextInt(3))(alpha(rnd.nextInt(2))).mkString
    for (_ <- 1 to 300) {
      val w = Array.fill(rnd.nextInt(20))(alpha(rnd.nextInt(2))).mkString
      val rank = List.fill(rnd.nextInt(8))((tok(), tok())).distinct.zipWithIndex.toMap
      val toks = graft.text.Bpe.encodeWord(w, rank)
      assert(toks.mkString("") == w, s"w=$w rank=$rank -> ${toks.toSeq}")
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        assert(!rank.contains((p(0), p(1))), s"w=$w rank=$rank -> ${toks.toSeq}")
      }
    }
  }
}
