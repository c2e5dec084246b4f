package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boolean retrieval over an inverted index — the AND/NOT primitive under
  * every faceted or filtered search box, and the exact-match complement to
  * the ranked lexical trio (BM25 / TF-IDF / query-likelihood): "documents
  * containing ALL of these terms and NONE of those" is a set algebra
  * question, not a scoring one, and answering it through a ranker both
  * over-computes and under-specifies (a ranker can't promise absence).
  *
  * Scale shape — pure posting-list algebra, never a corpus text scan:
  *  - the AND side filters the (id, term) posting frame to the query's
  *    must-terms (a broadcast-literal `isin`, pushed to the posting scan),
  *    then one map-side-combined aggregate keeps ids whose DISTINCT
  *    must-term count equals |must| — k-way list intersection as a single
  *    count, no k-way self-join;
  *  - the NOT side is one anti-join against the postings filtered to the
  *    banned terms — also posting-list-sized. Order: intersect FIRST (the
  *    biggest shrink), then subtract.
  * Posting lists for selective terms are tiny next to the corpus; the whole
  * query touches only their rows — exactly why inverted indexes exist.
  *
  * `postings`: (id, term) rows, duplicates allowed (the [[graft.SparkEntry]]
  * lexTokens frame's contract — countDistinct absorbs them).
  * Output: (id) — matching document ids, unordered (callers sort). */
object BooleanRetrieval {

  def retrieve(postings: DataFrame, idCol: String, termCol: String,
      must: Seq[String], mustNot: Seq[String] = Nil): DataFrame = {
    require(must.nonEmpty, "BooleanRetrieval.retrieve: empty must-term set")
    // dedupe the query's term list: a caller-side duplicate must-term would
    // otherwise make countDistinct (≤ distinct terms) unable to ever reach
    // must.size and silently return zero rows
    val m = must.distinct
    val p = postings.select(col(idCol).as("id"), col(termCol).as("term"))
    val hits = p.filter(col("term").isin(m: _*))
      .groupBy("id")
      .agg(countDistinct(col("term")).as("_k"))
      .filter(col("_k") === m.size)
      .select("id")
    if (mustNot.isEmpty) hits
    else hits.join(
      p.filter(col("term").isin(mustNot: _*)).select("id").distinct(),
      Seq("id"), "left_anti")
  }
}
