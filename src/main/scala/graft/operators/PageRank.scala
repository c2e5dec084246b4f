package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over a DataFrame edge list — entity-importance scoring
  * for graph-RAG corpora (rank entities/relations by structural centrality to
  * prioritize retrieval seeds, curation budgets, or eviction order). The
  * reference has no centrality operator; this is a scale-pipeline addition in
  * the same family as its subgraph machinery (knowledge_graph.py:258-358 walks
  * the same adjacency this ranks).
  *
  * Semantics (classic damped PageRank, fixed iteration count so the result is
  * a pure deterministic function of the edge list):
  *
  *   rank_0(v)   = 1/N
  *   rank_i(v)   = (1-d)/N + d * Σ_{(u,v) ∈ E} rank_{i-1}(u) / outdeg(u)
  *
  * over the node set N = {v : v has at least one OUT-edge}. Dangling mass is
  * dropped, not redistributed — callers wanting the strongly-connected variant
  * symmetrize the edge list first ([[cooccurrenceEdges]] does), which makes
  * dangling nodes impossible and keeps the per-iteration plan to exactly one
  * join + one aggregation.
  *
  * Scale shape: the degree-weighted edge list is materialized ONCE
  * (localCheckpoint) and reused by every iteration; each iteration is one
  * shuffle-join of edges⋈ranks on src plus one hash aggregation on dst — the
  * standard Spark PageRank plan, partial-aggregated map-side. Ranks are
  * checkpointed eagerly per iteration so lineage stays O(1) and a failed
  * executor replays one iteration, not the whole history. Nothing ever
  * collects to the driver.
  */
object PageRank {

  /** Symmetrized co-occurrence edge list: items sharing a group key become
    * mutual neighbors. `SELECT DISTINCT a.item, b.item FROM t a JOIN t b ON
    * same group AND a.item <> b.item` — one self-equi-join on the group key
    * (shuffle on groupCol, then distinct). Both directions appear by
    * construction, so the result is a valid input for [[run]] with no
    * dangling nodes. Group fan-out is the caller's contract: co-occurrence
    * is quadratic per group, so bound group sizes upstream (orders have ≤7
    * items; for unbounded groups cap with a per-group limit first). */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val l = df.select(col(groupCol).as("_g"), col(itemCol).as("src"))
    val r = df.select(col(groupCol).as("_g"), col(itemCol).as("dst"))
    l.join(r, Seq("_g"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** Run `iterations` damped PageRank passes over `edges` (columns `src`,
    * `dst`; duplicates must already be removed — they would double-count).
    * Returns (`id`, `pr`) for every node with at least one out-edge. */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    // Degree-weighted edges: (src, dst, invdeg). Built once, reused by every
    // iteration — the single most re-read frame, so it is the one to pin.
    val deg = edges.groupBy("src").agg(count(lit(1)).as("_d"))
    val weighted = edges.join(deg, Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("_d")).as("_invdeg"))
      .localCheckpoint(true)
    val nodes = deg.select(col("src").as("id")).localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("pr", lit(0.0))

    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contribs = weighted
        .join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("_invdeg")).as("_c"))
        .select(col("dst").as("id"), col("_c"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_c"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    ranks
  }
}
