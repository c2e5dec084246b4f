package graft

import graft.operators.Chunker

/** Deterministic corpus + golden chunk hashes for the T1 chunker
  * (loaders/chunker.py:27-98). The chunker is pure Scala, so its exact output
  * is pinned by a committed hash file: any behavioral drift (separator order,
  * stride, trim rules) fails the golden test even though the greedy re-pack
  * is not SQL-expressible for the DuckDB oracle.
  */
object ChunkerGoldenFixture {

  /** Exercises every chunker path: paragraph packing, sentence/space splits,
    * separator-free char-window fallback, unicode, short passthrough. */
  def docs: Seq[(String, String)] = {
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "λάμδα", "mu", "nu", "xi", "omicron")
    def sentence(n: Int) =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ") + "."
    def paragraph(s: Int) =
      Seq.fill(s)(sentence(3 + rnd.nextInt(9))).mkString(" ")
    (0 until 12).map { i =>
      val body = i % 4 match {
        case 0 => Seq.fill(4 + rnd.nextInt(4))(paragraph(2 + rnd.nextInt(3))).mkString("\n\n")
        case 1 => paragraph(30)          // one long paragraph: ". " splits
        case 2 => "x" * (900 + 137 * i)  // no separators: char-window fallback
        case _ => sentence(2)            // short passthrough
      }
      (s"doc$i", body)
    }
  }

  /** One row per chunk: `doc_id,chunk_index,md5(chunk),len(chunk)` with the
    * t1 parameters (chunkSize=200, overlap=50). */
  def goldenRows: Seq[String] =
    docs.flatMap { case (id, text) =>
      Chunker.chunkText(text, chunkSize = 200, overlap = 50).zipWithIndex.map {
        case (c, i) =>
          s"$id,$i,${org.apache.commons.codec.digest.DigestUtils.md5Hex(c)},${c.length}"
      }
    }

  /** Regenerate the committed golden file after an INTENDED chunker change:
    * `sbt "Test/runMain graft.ChunkerGoldenFixture"` then review the diff. */
  def main(args: Array[String]): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get("src/test/resources/chunker_golden.csv"),
      goldenRows.mkString("\n").getBytes("UTF-8"))
}
