package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop multi-source shortest paths — Bellman–Ford relaxation over a
  * weighted symmetric edge list, the distance kernel behind graph-proximity
  * features (how close is this entity to the query's seeds?), influence
  * radii, and hop-bounded neighborhood weighting. The graph-RAG use is a
  * weighted upgrade of [[SubgraphExpansion]]'s uniform-hop traversal: with
  * co-occurrence edges weighted 1/multiplicity, "distance" prefers paths
  * through STRONGLY co-occurring pairs, so the d-ball around a seed is a
  * relevance-weighted subgraph rather than a purely topological one.
  *
  * Semantics: after `hops` rounds, `d(seed, node)` is the weight of the
  * lightest path from `seed` to `node` using at most `hops` edges (the
  * standard Bellman–Ford invariant) — unreached (seed, node) pairs are
  * absent. Distances accumulate hop-by-hop (d_{k+1} = d_k + w), a fixed
  * float dataflow an unrolled SQL twin reproduces exactly.
  *
  * Scale shape (the [[SubgraphExpansion]]/[[RandomWalk]] frontier contract):
  * each round is ONE dist⋈edges equi-join on the node plus one
  * map-side-combined (seed, node) min — shuffle bounded by frontier ×
  * average degree, never all-pairs; the dist frame is checkpointed per round
  * (read by the next relaxation AND the union), so no lineage re-runs. At
  * 100 TB the edge list would be bucketed by `src` so every relaxation
  * co-locates; hop count bounds total work regardless of graph diameter.
  *
  * `edges`: symmetric (src, dst, w) with w > 0, both directions present.
  * `seeds`: one `node` column. Output: (seed, node, d) with d = 0.0 for the
  * seed itself.
  */
object ShortestPaths {

  def boundedSssp(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    require(hops >= 1, s"hops must be >= 1, got $hops")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .localCheckpoint(true) // scanned once per round
    var dist = seeds.select(col("node")).distinct()
      .select(col("node").as("seed"), col("node"), lit(0.0).as("d"))
      .localCheckpoint(true)
    for (_ <- 1 to hops) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(col("seed"), e("dst").as("node"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("seed", "node").agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Sampled bounded-hop Brandes betweenness — the "who do paths flow
    * THROUGH" centrality the family still lacked (PageRank ranks by
    * endorsement mass, harmonic by reachability; betweenness finds the
    * BRIDGES whose removal disconnects communities — the entity that links
    * two topic clusters in a knowledge graph, the broker in a co-occurrence
    * network). Exact betweenness is one BFS per NODE (unpayable); the two
    * standard published cuts compose here: source SAMPLING (Brandes &
    * Pich 2007 — the seed frame is any deterministic hash sample, the sum
    * over sampled sources is the estimator) and hop BOUNDING (Brandes 2008's
    * k-betweenness — dependencies only accumulate along paths of ≤ `hops`
    * edges, which at 100 TB is also the only shuffle-bounded option).
    *
    * Per source, Brandes' two passes, level-synchronous:
    * FORWARD — BFS levels with path counts: σ(v) at level l+1 is
    * Σ σ(u) over level-l in-neighbors, an INTEGER map-side-combinable sum;
    * frontier = one frontier⋈edges equi-join + one anti-join against the
    * visited set per level (the [[boundedSssp]] contract: shuffle bounded
    * by frontier × degree, never all-pairs; every frame localCheckpointed,
    * flat lineage). BACKWARD — dependency accumulation from the deepest
    * level up: δ(v) = Σ_w (σ(v)/σ(w))·(1+δ(w)) over level-(l+1) successors
    * w; σ ratios are exact integer-derived doubles, and each per-node sum
    * folds in SUCCESSOR-ID order (sorted-array fold / DuckDB ordered
    * aggregate — the sim8 convention) so the float value is partition-
    * order-free and an unrolled SQL twin reproduces it bit-for-bit. The
    * deepest level's δ is 0 by the hop bound (truncation, not divergence).
    *
    * `edges`: symmetric unweighted (src, dst), both directions present.
    * `seeds`: one `node` column (the sampled sources). Output: (node,
    * n_seeds, bc) for every node with positive dependency — bc is the
    * truncated-Brandes sum over the given seeds, n_seeds the number of
    * seeds that routed any shortest path through the node. */
  def betweennessBounded(edges: DataFrame, seeds: DataFrame,
      hops: Int = 3): DataFrame = {
    require(hops >= 2, s"hops must be >= 2 (no interior node otherwise), got $hops")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val lv = new Array[DataFrame](hops + 1)
    lv(0) = seeds.select(col("node")).distinct()
      .select(col("node").as("seed"), col("node"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    var visited = lv(0).select("seed", "node").localCheckpoint(true)
    for (l <- 1 to hops) {
      lv(l) = lv(l - 1).join(e, lv(l - 1)("node") === e("src"))
        .select(col("seed"), e("dst").as("node"), col("sigma"))
        .groupBy("seed", "node").agg(sum("sigma").as("sigma"))
        .join(visited, Seq("seed", "node"), "left_anti")
        .localCheckpoint(true)
      val nextVisited = visited.unionByName(lv(l).select("seed", "node"))
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(visited)
      visited = nextVisited
    }
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(visited)
    // backward: delta over levels hops-1 .. 1 (deepest delta = 0 by bound)
    var delta: DataFrame = null // (seed, node, delta) of level l+1
    var acc: DataFrame = null
    for (l <- (hops - 1) to 1 by -1) {
      val succ0 = lv(l).as("v").join(e, col("v.node") === e("src"))
        .join(lv(l + 1).as("w"),
          col("w.seed") === col("v.seed") && col("w.node") === e("dst"))
        .select(col("v.seed").as("seed"), col("v.node").as("node"),
          col("v.sigma").as("sigma"), col("w.node").as("__w"),
          col("w.sigma").as("__sw"))
      val succ = if (delta == null) succ0.withColumn("__dw", lit(0.0))
        else succ0.join(delta.select(col("seed"), col("node").as("__w"),
          col("delta").as("__dw")), Seq("seed", "__w"), "left")
      val dl = succ
        .select(col("seed"), col("node"), col("__w"),
          ((col("sigma").cast("double") / col("__sw")) *
            (lit(1.0) + coalesce(col("__dw"), lit(0.0)))).as("__t"))
        .groupBy("seed", "node")
        .agg(sort_array(collect_list(struct(col("__w"), col("__t")))).as("__a"))
        .select(col("seed"), col("node"),
          aggregate(transform(col("__a"), t => t.getField("__t")),
            lit(0.0), (a, x) => a + x).as("delta"))
        .localCheckpoint(true)
      delta = dl
      acc = if (acc == null) dl else acc.unionByName(dl)
    }
    // the result plan reads only the checkpointed per-level delta frames;
    // the edge list and forward frontiers are no longer reachable — free them
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(e)
    lv.foreach(org.apache.spark.sql.graft.Bridge.unpersistCheckpoint)
    acc
      .groupBy("node")
      .agg(count(lit(1)).as("n_seeds"),
        sort_array(collect_list(struct(col("seed"), col("delta")))).as("__a"))
      .select(col("node"), col("n_seeds"),
        aggregate(transform(col("__a"), t => t.getField("delta")),
          lit(0.0), (a, x) => a + x).as("bc"))
  }
}
