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
}
