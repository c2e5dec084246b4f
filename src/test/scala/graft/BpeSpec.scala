package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference BPE trainer (same conventions: overlapping pair
    * counts, lexicographic tie-break, leftmost-greedy merge). */
  private def refTrain(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => w.map(_.toString).toVector -> f }
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 0 until numMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((a, b))
        words = words.toSeq.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    merges.result()
  }

  private val corpus = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train matches an independent reference implementation merge-for-merge") {
    val wf = corpus.toSeq.toDF("word", "freq")
    val got = Bpe.train(wf, numMerges = 8)
    val want = refTrain(corpus, numMerges = 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // sanity on the classic example: 'es'/'est' family emerges early
    assert(got.take(3).map { case (a, b) => a + b }.contains("es"))
  }

  test("train is repartition-stable and stops early when pairs run out") {
    val wf = corpus.toSeq.toDF("word", "freq")
    val a = Bpe.train(wf, 5)
    val b = Bpe.train(wf.repartition(7), 5)
    assert(a == b)
    // single-char vocabulary exhausts immediately
    val tiny = Seq(("a", 3L), ("b", 1L)).toDF("word", "freq")
    assert(Bpe.train(tiny, 10).isEmpty)
  }

  test("encodeWord equals a reference encoder on random words") {
    /** Reference: repeatedly apply the lowest-rank applicable merge to all
      * leftmost-first occurrences. */
    def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var syms = word.map(_.toString).toVector
      var changed = true
      while (changed && syms.size >= 2) {
        val applicable = syms.zip(syms.tail).filter(rank.contains)
        if (applicable.isEmpty) changed = false
        else {
          val (a, b) = applicable.minBy(rank)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
    val wf = corpus.toSeq.toDF("word", "freq")
    val merges = Bpe.train(wf, 8)
    val rnd = new scala.util.Random(53)
    val alphabet = "lowernst widew"
    for (_ <- 0 until 200) {
      val w = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Bpe.encodeWord(w, merges) == refEncode(w, merges), s"word '$w'")
    }
  }

  test("encodeWord applies merges by rank; encode round-trips concatenation") {
    val wf = corpus.toSeq.toDF("word", "freq")
    val merges = Bpe.train(wf, 8)
    // a word from the training set encodes to few symbols; an unseen word
    // still decomposes and concatenation reproduces it exactly
    for (w <- Seq("lowest", "newest", "wider", "glow")) {
      val enc = Bpe.encodeWord(w, merges)
      assert(enc.mkString == w, s"$w -> $enc")
    }
    assert(Bpe.encodeWord("newest", merges).size <
      "newest".length, "trained word must compress")
    // column form agrees with the scalar form
    val df = Seq(("d1", Seq("lowest", "newest"))).toDF("id", "toks")
    val got = Bpe.encode(df, "toks", "sub", merges)
      .select("sub").as[Seq[String]].head()
    assert(got == Seq("lowest", "newest").flatMap(Bpe.encodeWord(_, merges)))
  }

  test("trainLocal equals trainDistributed merge-for-merge on random corpora") {
    val rnd = new scala.util.Random(1019)
    // Alphabet deliberately includes supplementary-plane symbols (the emoji is
    // two UTF-16 units) and U+FFFD (sorts above surrogates in UTF-16 but below
    // the emoji in code-point/UTF-8 order) so both the code-point split and
    // the binary tie-break are exercised, plus repeats to force "aaa" overlaps.
    val alphabet = Vector("a", "b", "c", "a", "a", "😀", "�", "é")
    for (trial <- 0 until 6) {
      val corpus = (0 until 30 + rnd.nextInt(40)).map { _ =>
        val w = (0 until 1 + rnd.nextInt(8))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val numMerges = 1 + rnd.nextInt(12)
      val local = Bpe.trainLocal(corpus, numMerges)
      val dist = Bpe.trainDistributed(corpus.toDF("word", "freq"), numMerges)
      assert(local == dist, s"trial $trial merges=$numMerges\nlocal: $local\ndist:  $dist")
    }
  }

  test("train dispatches to the local loop and agrees with the distributed path") {
    val wf = corpus.toSeq.toDF("word", "freq")
    assert(Bpe.train(wf, 8) == Bpe.trainDistributed(wf, 8))
    // forcing the distributed regime through the public API gives the same model
    assert(Bpe.train(wf, 8, maxLocalVocab = 0) == Bpe.train(wf, 8))
  }

  test("encodeWord splits supplementary-plane words by code point") {
    // no merges: the base split itself must be code points, not UTF-16 units
    val w = "a😀b"
    assert(Bpe.encodeWord(w, Nil) == Seq("a", "😀", "b"))
    // a merge learned over an emoji pair applies at encode time
    val wf = Seq(("😀😀", 5L)).toDF("word", "freq")
    val merges = Bpe.train(wf, 1)
    assert(merges == Seq(("😀", "😀")))
    assert(Bpe.encodeWord("😀😀", merges) ==
      Seq("😀😀"))
  }
}
