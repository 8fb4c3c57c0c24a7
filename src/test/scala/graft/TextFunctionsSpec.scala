package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions.col

/** Vectors generated from the reference maco/util.py:11 get_cleaned_text. */
class TextFunctionsSpec extends SparkSpec {
  val vectors: Seq[(String, String)] = Seq(
    "Hello, World!" -> "hello world",
    "The Quick Brown Fox" -> "quick brown fox",
    "a the of" -> "of",
    "Größe-Straße" -> "gre strae",
    "customer#042" -> "customer 042",
    "  spaces   everywhere  " -> "spaces everywhere",
    "IS IT NOT" -> "not",
    "a a a a" -> "a",
    "data-lake_index v2" -> "data lake index v2",
    "the" -> "the",
    " the " -> "the",
    "x" -> "x",
    "" -> "",
    "AUTOMOBILE" -> "automobile",
    "Ärger 100%" -> "rger 100"
  )

  test("cleanedText matches reference vectors") {
    import spark.implicits._
    val df = vectors.map(_._1).toDF("raw")
    val out = df.select(TextFunctions.cleanedText(col("raw")).as("c")).collect().map(_.getString(0))
    out.zip(vectors).foreach { case (got, (in, want)) =>
      assert(got == want, s"input '$in'")
    }
  }

  /** Vectors independently derived from maco/util.py:250
    * generate_Simhash's published algorithm (md5 feature hash over char
    * 3-grams of the lowercased non-word-stripped token, f=128, bit set
    * on strictly positive weighted sum), as (hi, lo) signed longs.
    */
  val simhash128Vectors: Seq[(String, (Long, Long))] = Seq(
    "hello world" -> ((4693533796357124104L, -4898379191337243435L)),
    // case + punctuation are stripped before feature extraction, so
    // this MUST collide with "hello world" exactly
    "Hello, World!" -> ((4693533796357124104L, -4898379191337243435L)),
    "a" -> ((919145239626757800L, 3585878926028121697L)),
    "" -> ((-3162216497309240828L, -1621285313438006658L)),
    "Data Lake 42" -> ((-2123621712074364260L, -3757568744834718202L)),
    "ab" -> ((1765116674205471180L, 3404963397999061920L))
  )

  test("simhash128 matches the reference md5 construction bit for bit") {
    simhash128Vectors.foreach { case (in, want) =>
      assert(graft.functions.SimHash.simhash128(in) == want, s"input '$in'")
    }
    // and through the UDF surface
    import spark.implicits._
    val out = simhash128Vectors.map(_._1).toDF("t")
      .select(graft.functions.SimHash.simhash128Udf(col("t")).as("s"))
      .select(col("s._1"), col("s._2")).as[(Long, Long)].collect()
    assert(out.toSeq == simhash128Vectors.map(_._2))
  }
}
