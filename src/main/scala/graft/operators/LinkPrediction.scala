package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over a symmetric edge list — Adamic-Adar scores for
  * node pairs at distance 2 (Adamic & Adar 2003, the standard
  * common-neighbor predictor): for a candidate non-edge (u, v),
  *
  *   AA(u, v) = Σ_{w ∈ Γ(u) ∩ Γ(v)} 1 / ln(deg(w))
  *
  * weighting shared neighbors inversely by how promiscuous they are — a
  * shared rare neighbor is strong evidence, a shared hub is weak. The
  * graph-RAG use is knowledge-graph completion: entity pairs that share
  * many selective relations/passages but have no direct relation yet are
  * the edges an extraction pass most likely MISSED, so they rank curation
  * and re-extraction budgets (the reference's builder only materializes
  * extracted triplets, graph/builder.py:85-147; predicting absent ones is
  * a scale-pipeline addition).
  *
  * Scale shape: the score needs the length-2 path (wedge) table — the one
  * genuinely quadratic object here — so everything hinges on bounding it:
  *  - the wedge join routes THROUGH the center w, and is pruned BEFORE the
  *    join by `maxHubDegree`: hub centers explode wedge counts (a degree-d
  *    center emits d² wedges) while contributing the least per pair
  *    (1/ln d), so capping the center degree is the standard
  *    accuracy-preserving sparsifier — done with a broadcast of the
  *    node-sized high-degree set, never an edge shuffle.
  *  - degrees are computed once (node-sized, broadcast into the prune and
  *    carried on the surviving wedge rows, so the final aggregate needs no
  *    further join).
  *  - known edges leave via one anti-join on the canonical (u < v) pair —
  *    output-sized, not wedge-sized, because it runs AFTER the (u,v)
  *    aggregate collapses the wedge table.
  * Center degrees on a wedge are ≥ 2 by construction (a center with one
  * neighbor forms no u < v pair), so ln(deg) is never 0.
  *
  * `edges`: SYMMETRIC directed pair list, both directions present, no
  * duplicates ([[PageRank.cooccurrenceEdges]]'s contract). Output: one row
  * per predicted pair — (src, dst) with src < dst, `common` = shared
  * neighbors counted through surviving centers, `aa` = the (unrounded)
  * Adamic-Adar score. Callers round before comparing across engines: the
  * per-pair sum carries float associativity noise bounded by `common`.
  * The result derives from the pinned edge checkpoint; long-lived callers
  * free it with `Bridge.unpersistPlanCheckpoints(result)` after their last
  * action.
  */
object LinkPrediction {

  def adamicAdar(edges: DataFrame, maxHubDegree: Int): DataFrame = {
    require(maxHubDegree >= 2, s"maxHubDegree must be >= 2, got $maxHubDegree")
    // Scanned by the degree aggregate and both wedge legs; pin once.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
    // Wedge legs keyed on the center: leg1 = (u, w), leg2 = (w, v). The
    // center-degree prune and the degree carry ride one broadcast join on
    // the first leg; u < v keeps each unordered pair once.
    val leg1 = e.select(col("src").as("u"), col("dst").as("w"))
      .join(broadcast(deg.filter(col("_d") <= maxHubDegree)
        .select(col("id").as("w"), col("_d").as("_dw"))), Seq("w"))
    val wedges = leg1.join(e.select(col("src").as("w"), col("dst").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"),
        sum(lit(1.0) / log(col("_dw"))).as("aa"))
    val known = e.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    scored.join(known, Seq("u", "v"), "left_anti")
      .select(col("u").as("src"), col("v").as("dst"), col("common"), col("aa"))
  }
}
