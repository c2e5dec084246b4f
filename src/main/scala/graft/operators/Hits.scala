package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities over a DataFrame edge list —
  * the bipartite companion to [[PageRank]] for graph-RAG centrality: on an
  * entity↔passage (or supplier↔part) adjacency, authority score ranks the
  * "referenced" side by the quality of its referrers and hub score ranks the
  * referrers by the quality of what they reference — a two-sided importance
  * signal a single PageRank over the symmetrized graph collapses. The
  * reference has no centrality operator (its knowledge_graph.py:258-358
  * walks the same adjacency this ranks); scale-pipeline addition.
  *
  * Semantics (fixed iteration count, max-normalized each half-step so the
  * result is a pure deterministic function of the edge list):
  *
  *   hub_0(u)  = 1
  *   auth_i(v) = Σ_{(u,v) ∈ E} hub_{i-1}(u),  then divided by max_v auth_i
  *   hub_i(u)  = Σ_{(u,v) ∈ E} auth_i(v),     then divided by max_u hub_i
  *
  * Max-normalization (not L2/sum) is deliberate: max over a set of doubles is
  * order-independent, so both the Spark plan and an oracle reproduce the
  * normalizer exactly; only the per-node sums carry float associativity noise
  * (bounded by node degree, absorbed by output rounding — the same contract
  * as [[PageRank.run]]).
  *
  * Scale shape, same regime argument as [[PageRank.run]]: the edge list (the
  * large side) is materialized ONCE and never shuffled — each half-step is a
  * node-sized broadcast of the current score vector into a hash join plus one
  * map-side-combined aggregation, so per-iteration data motion is O(nodes),
  * not O(edges). Score frames are checkpointed per half-step (O(1) lineage;
  * superseded checkpoints freed). Past the broadcast regime (tens of millions
  * of nodes), run the same recurrence with GraphX `aggregateMessages` as
  * [[PageRank.runBig]] does — edge tables co-partitioned, nothing broadcast.
  *
  * `edges` must be duplicate-free (duplicates double-count, exactly as they
  * would in the adjacency a caller derives this from). Returns one row per
  * node per side: (`role` ∈ {"hub","auth"}, `id`, `score` ∈ (0,1]). Every dst
  * has an in-edge and every src an out-edge by construction, so no zero
  * scores and the max normalizers are always positive.
  *
  * Memory contract: the returned frame IS a local checkpoint (node-sized;
  * every intermediate is freed before return). Long-lived callers free it
  * with `Bridge.unpersistCheckpoint(result)` when done — pinned by the
  * GraphAnalyticsSpec block-hygiene test. */
object Hits {

  def run(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val B = org.apache.spark.sql.graft.Bridge
    var hub = e.select(col("src").as("id")).distinct()
      .withColumn("s", lit(1.0)).localCheckpoint(true)
    var auth: DataFrame = null
    for (i <- 1 to iterations) {
      // raw sums are checkpointed BEFORE the scalar max action so the frame
      // is materialized once and the normalized view is a free projection
      val araw = e.join(broadcast(hub), col("src") === col("id"))
        .groupBy(col("dst")).agg(sum(col("s")).as("_s"))
        .localCheckpoint(true)
      val amax = araw.agg(max(col("_s"))).head.getDouble(0)
      val anext = araw.select(col("dst").as("id"), (col("_s") / amax).as("s"))
        .localCheckpoint(true)
      B.unpersistCheckpoint(araw)
      if (auth != null) B.unpersistCheckpoint(auth)
      auth = anext
      val hraw = e.join(broadcast(auth), col("dst") === col("id"))
        .groupBy(col("src")).agg(sum(col("s")).as("_s"))
        .localCheckpoint(true)
      val hmax = hraw.agg(max(col("_s"))).head.getDouble(0)
      val hnext = hraw.select(col("src").as("id"), (col("_s") / hmax).as("s"))
        .localCheckpoint(true)
      B.unpersistCheckpoint(hraw)
      B.unpersistCheckpoint(hub)
      hub = hnext
    }
    val out = hub.select(lit("hub").as("role"), col("id"), col("s").as("score"))
      .unionByName(auth.select(lit("auth").as("role"), col("id"), col("s").as("score")))
      .localCheckpoint(true)
    // the union checkpoint is self-contained; free the feeding frames so a
    // long-lived caller doesn't accumulate pinned per-call blocks
    B.unpersistCheckpoint(hub); B.unpersistCheckpoint(auth); B.unpersistCheckpoint(e)
    out
  }
}
