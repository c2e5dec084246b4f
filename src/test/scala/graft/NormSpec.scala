package graft

import graft.functions.Norm
import graft.rag.TextNorm
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class NormSpec extends SparkSpec {
  import spark.implicits._

  private def normDf(s: String): String =
    Seq(s).toDF("t").select(Norm.normPhrase($"t")).as[String].head()

  private def samples(g: Gen[String], n: Int = 60): Seq[String] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("T2: lowercase, non-alnum to space, trim (llm/extractor.py:17-28)") {
    assert(normDf("Albert-Einstein!") == "albert einstein")
    assert(normDf("  Foo  Bar  ") == "foo  bar")
    assert(normDf("a.b") == "a b")
    assert(normDf("爱因斯坦") == "")
    assert(normDf("") == "")
  }

  test("T2 column and driver-side implementations agree (property)") {
    val cases = samples(Gen.asciiPrintableStr) ++
      Seq("Ünïcode Mix 日本語 42", "a-b.c_d", "  spaced   out  ")
    val df = cases.toDF("t").select($"t", Norm.normPhrase($"t").as("n"))
      .as[(String, String)].collect()
    df.foreach { case (raw, sparkNorm) =>
      assert(sparkNorm == TextNorm.normalize(raw), s"input: <$raw>")
    }
  }

  test("T2 is idempotent (property)") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = TextNorm.normalize(s)
      assert(TextNorm.normalize(once) == once)
    }
  }

  test("T3 relation text composes normalized parts (graph/builder.py:99-103)") {
    val got = Seq(("A-B", "Is", "C!"))
      .toDF("s", "p", "o")
      .select(Norm.relationText($"s", $"p", $"o")).as[String].head()
    assert(got == "a b is c")
  }

  test("T5 title = first line trimmed (evaluation/evaluate.py:219-229)") {
    val got = Seq(" Title \nbody\nmore").toDF("t")
      .select(Norm.titleOf($"t")).as[String].head()
    assert(got == "Title")
  }

  test("tokens drops empties; shingles build word n-grams") {
    val toks = Seq("a  b c").toDF("t")
      .select(Norm.tokens($"t")).as[Seq[String]].head()
    assert(toks == Seq("a", "b", "c"))
    val sh = Seq("the quick brown fox").toDF("t")
      .select(Norm.shingles(Norm.normTokens($"t"), 3)).as[Seq[String]].head()
    assert(sh == Seq("the quick brown", "quick brown fox"))
    val short = Seq("one two").toDF("t")
      .select(Norm.shingles(Norm.normTokens($"t"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }
}
