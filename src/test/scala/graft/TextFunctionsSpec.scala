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
}
