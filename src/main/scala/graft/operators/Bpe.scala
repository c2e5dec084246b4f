package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-encoding tokenizer TRAINING over a corpus — vocabulary learning
  * is itself a corpus-scale pipeline step (the tokenizer shipped with a model
  * is trained on the same 100 TB crawl the model is). Classic BPE (Sennrich et
  * al. 2016): start from characters, repeatedly merge the most frequent
  * adjacent symbol pair.
  *
  * Scale shape: the ONE corpus-sized pass is [[wordFrequencies]] (explode +
  * hash aggregate). Training then runs entirely on the word-frequency table —
  * VOCABULARY-sized, not corpus-sized — with one weighted pair-count
  * aggregate + one bounded argmax collect + one fold-merge projection per
  * round, each round's table checkpointed and the previous round's blocks
  * freed. Determinism: ties in pair frequency break lexicographically, and
  * merging is leftmost-greedy within a word, so the merge list is a pure
  * function of the corpus.
  *
  * Conventions (pinned by BpeSpec against an independent reference
  * implementation): pair counts are over OVERLAPPING adjacent positions
  * ("aaa" contributes (a,a) twice), and a merge rewrites every
  * leftmost-first occurrence in the same round.
  */
object Bpe {

  /** The corpus-sized pass: (word, freq) over an already-tokenized column.
    * Everything downstream is vocabulary-sized. */
  def wordFrequencies(df: DataFrame, toksCol: String): DataFrame =
    df.select(explode(col(toksCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character split of a word — the round-0 symbol sequence. */
  private[operators] def chars(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)).cast("string"))

  private def charsSafe(word: Column): Column =
    when(length(word) === 0, array().cast("array<string>")).otherwise(chars(word))

  /** Weighted adjacent-pair counts of a (syms, freq) table: one explode +
    * one map-side-combined hash aggregate. Shared by training rounds and the
    * oracle-checked counting kernel. */
  private[operators] def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** One leftmost-greedy merge of (a, b) → a+b inside a symbol array, as a
    * single codegen'd fold. */
  private[operators] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Learn `numMerges` merges from a (word, freq) table. Returns the ordered
    * merge list — the tokenizer model. Driver work per round is ONE row (the
    * argmax pair); the word table stays distributed throughout. Stops early
    * when no adjacent pair remains. */
  def train(wordFreq: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0)
    var words = wordFreq
      .select(charsSafe(col("word")).as("syms"), col("freq").cast("long").as("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = words
          .withColumn("syms", mergePair(col("syms"), a, b))
          .localCheckpoint(true)
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(words)
        words = next
      }
      round += 1
    }
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(words)
    merges.result()
  }

  /** Encode one word with a learned merge list: repeatedly apply the
    * applicable merge with the LOWEST rank (training order), leftmost-greedy,
    * until none applies — the standard BPE encoder. Pure Scala; usable on the
    * driver or inside [[encode]]'s per-row kernel. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    encodeWithRanks(word, merges.zipWithIndex.toMap)

  /** [[encodeWord]] against a PREBUILT rank map — the form the corpus-scale
    * kernel uses, so a 30k-merge model is hashed once per executor closure,
    * not once per token. */
  private def encodeWithRanks(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.size < 2
    while (!done) {
      val best = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
        .minByOption(_._1)
      best match {
        case None => done = true
        case Some((_, (a, b))) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
          done = syms.size < 2
      }
    }
    syms
  }

  /** Subword-encode a token-array column. The merge list is a small
    * broadcastable model; the per-row work is the bounded [[encodeWord]]
    * loop — an imperative tokenizer kernel (like the reference's own
    * tokenizers), deliberately NOT unrolled into `numMerges` nested fold
    * expressions, which would blow up codegen for real merge counts. */
  def encode(df: DataFrame, toksCol: String, outCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val rank = merges.zipWithIndex.toMap // built once, shipped in the closure
    val enc = udf((toks: Seq[String]) =>
      if (toks == null) Seq.empty[String] else toks.flatMap(encodeWithRanks(_, rank)))
    df.withColumn(outCol, enc(col(toksCol)))
  }
}
