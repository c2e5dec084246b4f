package graft.operators

import graft.functions.Norm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-phrase search over positional postings — the lexical operator BM25
  * cannot express (bag-of-words scoring loses adjacency; "new york" must not
  * match "york new"). Reference-side retrieval is embeddings-only
  * (retriever.py:101-132), so like [[Bm25]] this is an engine extension a
  * production RAG/curation pipeline expects: phrase filters for boilerplate
  * hunting, exact-quote retrieval, and contamination forensics (find the
  * documents containing this exact benchmark sentence).
  *
  * Scale shape: the corpus tokenizes into (id, pos, term) ONCE, is pruned to
  * the phrase's terms BEFORE any join (posting-list economics — the pruned
  * frame is the union of k posting lists, checkpointed because each phrase
  * term re-reads it), then the phrase is an (k−1)-fold equi-join on
  * (id, pos − offset): each join's inputs are posting-list-sized, never
  * corpus-sized, and survivors shrink monotonically (term i+1 can only drop
  * candidates). A SAVED positional index would bucket by term
  * ([[graft.sources.BucketedTable]]) so the scan reads only the phrase's
  * partitions; the in-memory path here prunes the same way via the filter.
  *
  * Output: (id, n_hits) — documents containing the exact token phrase at
  * least once, with occurrence counts. Phrase terms are matched under the
  * engine-wide T2 normalization ([[Norm.normTokens]]), so callers pass raw
  * phrase words.
  */
object PhraseSearch {

  /** Result derives from one pinned posting checkpoint; long-lived callers
    * free it with `Bridge.unpersistPlanCheckpoints(result)` after their last
    * action (the engine-wide caller-must-free contract). */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseMatch: empty phrase")
    // the same T2 normalization normTokens applies, on a driver-side literal
    val terms = phrase.map(_.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim)
      .filter(_.nonEmpty)
    require(terms.nonEmpty, "phraseMatch: phrase normalized to nothing")
    val positions = docs
      .select(col(idCol).as("id"),
        posexplode(Norm.normTokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term").isin(terms: _*))
      .localCheckpoint(true) // k posting lists, read once per phrase term
    var cur = positions.filter(col("term") === terms.head)
      .select(col("id"), col("pos"))
    for (i <- 1 until terms.length)
      cur = cur.join(
        positions.filter(col("term") === terms(i))
          .select(col("id"), (col("pos") - i).as("pos")),
        Seq("id", "pos"))
    cur.groupBy("id").agg(count(lit(1)).as("n_hits"))
  }
}
