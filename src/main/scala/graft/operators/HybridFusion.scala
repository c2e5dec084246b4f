package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion of multiple retrieval runs — the glue between the dense
  * ([[VectorSearch]]/[[IvfIndex]]) and lexical ([[Bm25]]) paths. The reference
  * retrieves dense-only (retriever.py:101-132); hybrid dense+sparse with
  * reciprocal-rank fusion is the standard production upgrade, so the fusion is
  * its own operator rather than being buried in the engine.
  *
  * RRF (Cormack & Clarke, SIGIR'09): score(d) = Σ_runs 1 / (K + rank_run(d)),
  * rank-only — no score calibration across runs needed, which is exactly why
  * it is the default fusion in practice.
  *
  * Shape at scale: each run is already top-k-bounded (queries × k rows), so
  * fusion is a union of tiny frames + one (query, doc) sum + the bounded
  * [[TopKAggregator]] — no corpus-sized work at all. */
object HybridFusion {

  /** Fuse `runs`, each with columns (query_id, rank, doc_id) — top-k-bounded
    * retrieval outputs. A doc missing from a run simply contributes nothing
    * for that run (the standard RRF treatment). Ties pinned by doc id ASC.
    * Output: (query_id, rank, doc_id, score).
    *
    * NOTE (id dtype contract): doc ids return as the INDEX's string keys —
    * the source id dtype is erased when the index/run frame is built (it
    * persists to parquet with string ids), so this operator cannot restore
    * it. Numeric-keyed callers cast at the boundary; the b1/b4/b5/tf1/b2
    * board projections are the reference pattern. */
  def rrf(runs: Seq[DataFrame], k: Int, kConst: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrf needs at least one run")
    val contribs = runs.map(_.select(
      col("query_id").cast("string").as("query_id"),
      col("doc_id").cast("string").as("id"),
      (lit(1.0) / (lit(kConst.toDouble) + col("rank").cast("double"))).as("contrib")))
      .reduce(_ unionByName _)
    val topk = VectorSearch.topKUdaf(k)
    contribs
      .groupBy("query_id", "id")
      .agg(sum("contrib").as("score"))
      .groupBy("query_id")
      .agg(topk(col("id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }
}
