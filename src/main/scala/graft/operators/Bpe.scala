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
    * merge list — the tokenizer model.
    *
    * Two regimes, dispatched on the table's size: the word-frequency table is
    * VOCABULARY-sized by construction (a 100 TB crawl still yields maybe tens
    * of millions of distinct words), so when it fits the driver
    * (`maxLocalVocab`) we collect it once and run the merge loop locally —
    * the distributed loop costs ~2 driver-scheduled Spark jobs per merge, and
    * a real tokenizer is 30k–100k merges, a wall-clock killer at 60k–200k
    * jobs even though each job is tiny. Above the bound,
    * [[trainDistributed]] keeps every round distributed. The two paths are
    * equivalence-tested merge-for-merge in BpeSpec (incl. supplementary-plane
    * symbols and ties).
    */
  def train(wordFreq: DataFrame, numMerges: Int,
      maxLocalVocab: Int = 1 << 20,
      maxLocalBytes: Long = 256L << 20): Seq[(String, String)] = {
    require(numMerges >= 0)
    // Driver-memory contract: the collect below brings at most
    // maxLocalVocab+1 (word, freq) rows, and trainLocal's working set
    // (symbol lists, pair-occurrence index, lazy-deletion heap) is a small
    // multiple (~4-6×) of the raw string payload — so the defaults (1M words
    // / 256 MB of characters) keep peak driver demand around 1-2 GB. Above
    // EITHER bound the regime falls back to trainDistributed gracefully
    // instead of dying in an allocation: row count is checked by the bounded
    // fetch itself, and the byte budget is checked after the (cheap,
    // row-capped) collect but BEFORE the multiplied structures are built —
    // which is where a pathological long-word vocabulary would actually blow
    // up.
    val rows = wordFreq
      .select(col("word").cast("string"), col("freq").cast("long"))
      .limit(maxLocalVocab + 1).collect()
    lazy val charBytes = rows.iterator
      .map(r => if (r.isNullAt(0)) 0L else 2L * r.getString(0).length).sum
    if (rows.length <= maxLocalVocab && charBytes <= maxLocalBytes)
      trainLocal(rows.iterator.map(r =>
        (if (r.isNullAt(0)) "" else r.getString(0), r.getLong(1))).toSeq, numMerges)
    else trainDistributed(wordFreq, numMerges)
  }

  /** The fully-distributed merge loop: driver work per round is ONE row (the
    * argmax pair); the word table stays distributed throughout. ~2 Spark jobs
    * per merge — the giant-vocab escape hatch, not the default path. Stops
    * early when no adjacent pair remains. */
  def trainDistributed(wordFreq: DataFrame, numMerges: Int): Seq[(String, String)] = {
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

  /** Driver-local merge loop over a collected (word, freq) table — the
    * default training path (see [[train]]). Semantics are identical to
    * [[trainDistributed]]: overlapping pair counts, argmax by (count desc,
    * a asc, b asc) with string order matching Spark's binary UTF-8 ordering,
    * leftmost-greedy merge.
    *
    * Incremental algorithm so a 100k-merge train stays fast: pair counts are
    * maintained by subtracting a rewritten word's old adjacencies and adding
    * its new ones (only words actually containing the merged pair are
    * touched, found via an occurrence index), and the argmax comes from a
    * lazy-deletion heap — stale entries are dropped or re-pushed with their
    * current count on pop. Per-round cost is proportional to the words the
    * merge touches, not the vocabulary.
    */
  def trainLocal(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0)
    import scala.collection.mutable
    val entries = wordFreq.iterator
      .map { case (w, f) => (codePointSyms(w), f) }
      .filter(_._1.length >= 2)
      .toArray
    val wsyms = entries.map(_._1)
    val freqs = entries.map(_._2)

    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def bump(p: (String, String), delta: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + delta
      if (c <= 0L) counts.remove(p) else counts(p) = c
    }
    def pairsOf(v: Vector[String]): Iterator[(String, String)] =
      (0 until v.length - 1).iterator.map(j => (v(j), v(j + 1)))
    for (i <- wsyms.indices; p <- pairsOf(wsyms(i))) {
      bump(p, freqs(i))
      occ.getOrElseUpdate(p, mutable.BitSet.empty) += i
    }

    // Max-heap: higher count wins; ties prefer the UTF-8-byte-smaller (a, b),
    // matching the distributed path's `orderBy(cnt desc, a asc, b asc)` on
    // Spark's binary string ordering (String.compareTo would disagree on
    // supplementary-plane symbols — surrogates sort below U+E000 in UTF-16).
    def byteCmp(x: String, y: String): Int =
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val ord: Ordering[(Long, String, String)] = (x, y) => {
      if (x._1 != y._1) java.lang.Long.compare(x._1, y._1)
      else {
        val ca = byteCmp(x._2, y._2)
        if (ca != 0) -ca else -byteCmp(x._3, y._3)
      }
    }
    val heap = mutable.PriorityQueue.empty(ord)
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }

    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      var chosen: (String, String) = null
      while (chosen == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        val cur = counts.getOrElse((a, b), 0L)
        if (cur == c) chosen = (a, b)
        else if (cur > 0L) heap.enqueue((cur, a, b)) // stale: re-rank, keep draining
      }
      if (chosen == null) exhausted = true
      else {
        val (a, b) = chosen
        merges += ((a, b))
        val touched = mutable.HashSet.empty[(String, String)]
        // occ is a may-contain superset (indices are never removed when a
        // word stops containing a pair); mergeOnce leaves such words intact.
        for (i <- occ.getOrElse((a, b), mutable.BitSet.empty)) {
          val old = wsyms(i)
          val nw = mergeOnce(old, a, b)
          if (nw.length < old.length) {
            pairsOf(old).foreach { p => bump(p, -freqs(i)); touched += p }
            pairsOf(nw).foreach { p =>
              bump(p, freqs(i))
              occ.getOrElseUpdate(p, mutable.BitSet.empty) += i
              touched += p
            }
            wsyms(i) = nw
          }
        }
        counts.remove((a, b)) // fully rewritten: exact zero by construction
        occ.remove((a, b))
        touched.foreach { p =>
          val c = counts.getOrElse(p, 0L)
          if (c > 0L) heap.enqueue((c, p._1, p._2))
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Unicode-code-point split of a word — the JVM-side twin of [[chars]]
    * (Spark `substring` counts code points, `String#charAt` counts UTF-16
    * units; they disagree on supplementary-plane symbols). */
  private[operators] def codePointSyms(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One leftmost-greedy non-overlapping rewrite of (a, b) → a+b — the JVM
    * twin of [[mergePair]] (equal because a merged symbol `a+b` can only
    * equal `a` if `b` is empty, and symbols are never empty). */
  private[operators] def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
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
    var syms = codePointSyms(word) // code points, matching the training split
    var done = syms.size < 2
    while (!done) {
      val best = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
        .minByOption(_._1)
      best match {
        case None => done = true
        case Some((_, (a, b))) =>
          syms = mergeOnce(syms, a, b)
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
