package graft.operators

import graft.functions.Norm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Best-window snippet extraction — the presentation step after retrieval:
  * for each (query, matching document), find the fixed-width token window
  * covering the most DISTINCT query terms (ties → earliest window) and
  * return its text. The reference returns whole passages
  * (rag.py:437-544); at production result-page / context-packing time the
  * consumer wants the evidence span, not the document — and at 100 TB the
  * snippet must come from posting lists, not from re-scanning text.
  *
  * Scale shape ([[PhraseSearch]]'s posting-list economics):
  *  - the corpus tokenizes to (id, pos, term) once and is pruned to the
  *    queries' terms BEFORE any join — everything downstream is
  *    posting-list-sized, never corpus-sized;
  *  - candidate windows anchor ONLY at query-term hits (a window that
  *    starts off-hit is dominated by the same window shifted right), so
  *    the window self-join is (hits × hits-in-window) per doc, bounded by
  *    per-doc query-term hit counts;
  *  - the per-(query, doc) argmax is a max-of-struct aggregate — no
  *    windows over data;
  *  - text reconstruction joins the winners (result-sized) back to the
  *    corpus and slices the token array.
  *
  * Compose after a retrieval top-k (BM25/dense) to bound the doc set; on
  * an unrestricted corpus every document with ≥1 hit emits one row.
  *
  * Output: (query_id, doc_id, start_pos 1-based, n_terms, snippet). */
object Snippets {

  def bestWindow(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qId: String, qText: String,
      width: Int = 8): DataFrame = {
    require(width >= 1, "bestWindow: width must be >= 1")
    val qterms = queries.select(col(qId).cast("string").as("query_id"),
      explode(array_distinct(Norm.normTokens(col(qText)))).as("term"))
    // corpus → query-term posting lists, 1-based positions (the oracle's
    // generate_subscripts convention; also what slice() consumes)
    val hits = docs
      .select(col(idCol).as("doc_id"),
        posexplode(Norm.normTokens(col(textCol))).as(Seq("pos0", "term")))
      .join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"), (col("pos0") + 1).as("pos"),
        col("term"))
      .localCheckpoint(true) // hit-sized; both window self-join sides read it
    val windows = hits.as("a").join(hits.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") >= col("a.pos") &&
          col("b.pos") < col("a.pos") + width)
      .groupBy(col("a.query_id").as("query_id"), col("a.doc_id").as("doc_id"),
        col("a.pos").as("start_pos"))
      .agg(countDistinct(col("b.term")).as("n_terms"))
    val best = windows
      .groupBy("query_id", "doc_id")
      // max over (n_terms, -start): most distinct terms, then earliest
      .agg(max(struct(col("n_terms"), (-col("start_pos")).as("neg_start")))
        .as("w"))
      .select(col("query_id"), col("doc_id"), (-col("w.neg_start")).as("start_pos"),
        col("w.n_terms").as("n_terms"))
    // semi-join prunes the corpus to winner docs BEFORE the (expensive)
    // re-tokenize: the regexp runs on result-sized data, not the corpus
    val winnerToks = docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .join(best.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Norm.normTokens(col("_text")).as("_toks"))
    best.join(winnerToks, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("start_pos"), col("n_terms"),
        concat_ws(" ", slice(col("_toks"), col("start_pos"), lit(width)))
          .as("snippet"))
  }
}
