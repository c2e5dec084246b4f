package graft

import graft.operators.Chunker
import org.scalacheck.Gen

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("short text passes through unchanged (chunker.py:31-32)") {
    assert(Chunker.chunkText("hello world") == Seq("hello world"))
  }

  test("paragraph split packs greedily under the limit") {
    val paras = (1 to 10).map(i => s"paragraph $i " * 20).mkString("\n\n")
    val chunks = Chunker.chunkText(paras, chunkSize = 600, overlap = 100)
    assert(chunks.forall(_.length <= 600))
    assert(chunks.length > 1)
  }

  test("separator-free text falls back to char windows with stride (chunker.py:73-90)") {
    val t = "x" * 2500
    val chunks = Chunker.chunkText(t, chunkSize = 1000, overlap = 200)
    assert(chunks.map(_.length) == Seq(1000, 1000, 900))
  }

  test("coverage: every input char (modulo trimmed whitespace) appears in some chunk") {
    val gens = Gen.listOfN(300, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('\n')))
      .map(_.mkString)
    Iterator.continually(gens.sample).flatten.take(30).foreach { t =>
      val chunks = Chunker.chunkText(t, chunkSize = 50, overlap = 10)
      val joined = chunks.mkString(" ")
      t.split("\\s+").filter(_.nonEmpty).foreach { w =>
        assert(joined.contains(w), s"lost token <$w> for input <$t>")
      }
    }
  }

  test("T1 golden-file oracle: chunk hashes match the committed fixture") {
    val expected = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/chunker_golden.csv"), "UTF-8").getLines().toSeq
    assert(expected.nonEmpty)
    assert(ChunkerGoldenFixture.goldenRows == expected,
      "chunker output drifted from the golden file; if the change is intended, " +
        "regenerate with: sbt \"Test/runMain graft.ChunkerGoldenFixture\"")
  }

  test("distributed chunkDocuments agrees with the golden hashes row for row") {
    import org.apache.spark.sql.functions.{col, length, md5}
    val df = ChunkerGoldenFixture.docs.toDF("id", "text")
    val got = Chunker.chunkDocuments(df, chunkSize = 200, overlap = 50)
      .select(col("id"), col("chunk_index"), md5(col("chunk")), length(col("chunk")))
      .collect()
      .map(r => s"${r.getString(0)},${r.getInt(1)},${r.getString(2)},${r.getInt(3)}")
      .toSet
    assert(got == ChunkerGoldenFixture.goldenRows.toSet)
  }

  test("distributed chunking emits chunk_index/total_chunks (chunker.py:38-45)") {
    val df = Seq(("d1", "a " * 800), ("d2", "short")).toDF("id", "text")
    val out = Chunker.chunkDocuments(df, chunkSize = 300, overlap = 50)
      .orderBy("id", "chunk_index")
      .collect()
    val d1 = out.filter(_.getString(0) == "d1")
    assert(d1.length > 1)
    assert(d1.map(_.getInt(1)).toSeq == (0 until d1.length))
    assert(d1.forall(_.getInt(2) == d1.length))
    val d2 = out.filter(_.getString(0) == "d2")
    assert(d2.length == 1 && d2.head.getString(3) == "short")
  }
}
