package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** T1 recursive text chunker (loaders/chunker.py:27-98).
  *
  * Semantics: text ≤ chunkSize passes through unchanged; otherwise split on the
  * first separator (in priority order ["\n\n", "\n", ". ", " "]) that appears in the
  * text, greedily re-pack pieces to ≤ chunkSize; a piece that still exceeds
  * chunkSize falls through to the next separator; separator-free text falls back to
  * character windows of chunkSize with stride chunkSize − overlap
  * (chunker.py:73-74,88-90). Emits `chunk_index`/`total_chunks` (chunker.py:38-45).
  *
  * The splitter is a pure Scala function — applied distributed via `flatMap`, with
  * `posexplode` providing indices; each task chunks its own documents, no shuffle.
  */
object Chunker {

  val separators: Seq[String] = Seq("\n\n", "\n", ". ", " ")

  def chunkText(text: String, chunkSize: Int = 1000, overlap: Int = 200): Seq[String] = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
    def split(t: String, seps: Seq[String]): Seq[String] = {
      if (t.length <= chunkSize) return Seq(t)
      seps match {
        case Nil => // char-window fallback with stride chunkSize - overlap
          val stride = chunkSize - overlap
          val out = Seq.newBuilder[String]
          var i = 0
          var done = false
          while (!done) {
            out += t.substring(i, math.min(i + chunkSize, t.length))
            if (i + chunkSize >= t.length) done = true else i += stride
          }
          out.result()
        case sep +: rest =>
          if (!t.contains(sep)) split(t, rest)
          else {
            // split keeping the separator attached to the preceding piece, then
            // greedy re-pack to <= chunkSize
            val parts = splitKeepSep(t, sep)
            val packed = Seq.newBuilder[String]
            val buf = new StringBuilder
            parts.foreach { p =>
              if (buf.nonEmpty && buf.length + p.length > chunkSize) {
                packed += buf.toString; buf.clear()
              }
              if (p.length > chunkSize) { // oversized piece: recurse on finer seps
                if (buf.nonEmpty) { packed += buf.toString; buf.clear() }
                packed ++= split(p, rest)
              } else buf.append(p)
            }
            if (buf.nonEmpty) packed += buf.toString
            packed.result()
          }
      }
    }
    split(text, separators).map(_.trim).filter(_.nonEmpty)
  }

  private def splitKeepSep(t: String, sep: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < t.length) {
      val j = t.indexOf(sep, i)
      if (j < 0) { out += t.substring(i); i = t.length }
      else { out += t.substring(i, j + sep.length); i = j + sep.length }
    }
    out.result()
  }

  /** Distributed chunking: (id, text) → (id, chunk_index, total_chunks, chunk).
    * One `flatMap` per partition; no shuffle. */
  def chunkDocuments(docs: DataFrame, idCol: String = "id", textCol: String = "text",
      chunkSize: Int = 1000, overlap: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows: Dataset[(String, Seq[String])] = docs
      .select(col(idCol).cast("string"), col(textCol)).as[(String, String)]
      .map { case (id, text) => (id, chunkText(Option(text).getOrElse(""), chunkSize, overlap)) }
    rows.toDF("id", "chunks")
      .select(col("id"), size(col("chunks")).as("total_chunks"), posexplode(col("chunks")))
      .select(col("id"), col("pos").cast("int").as("chunk_index"),
        col("total_chunks"), col("col").as("chunk"))
  }

  /** T6 sentence segmentation — the sub-chunk text unit the chunker's ". "
    * separator already respects, exposed as its own operator: sentence-level
    * rows feed dedup (paragraph/sentence-level near-dup), quality signals
    * (per-sentence length distributions) and citation-granular retrieval.
    *
    * Rule-based and codegen'd end to end: a terminator ([.!?]) followed by
    * whitespace ends a sentence (the whitespace is consumed); the final
    * sentence keeps its terminator; empty fragments drop. The regex is
    * RE2-compatible (no lookbehind — the terminator is CAPTURED and re-
    * emitted with a \u0001 marker, then split on the marker), so any
    * RE2-based engine reproduces the segmentation byte-for-byte.
    *
    * Shape: one projection + posexplode per document — embarrassingly
    * parallel, no shuffle; `sent_idx` is the pre-filter position so indexes
    * are stable under the empty-fragment drop.
    *
    * Output: (id STRING, sent_idx INT 0-based, sentence, n_chars). */
  def splitSentences(docs: DataFrame, idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    val marked = regexp_replace(col(textCol), "([.!?])\\s+", "$1\u0001")
    docs.select(col(idCol).cast("string").as("id"), posexplode(split(marked, "\u0001")))
      .select(col("id"), col("pos").cast("int").as("sent_idx"),
        trim(col("col")).as("sentence"))
      .filter(length(col("sentence")) > 0)
      .withColumn("n_chars", length(col("sentence")))
  }
}
