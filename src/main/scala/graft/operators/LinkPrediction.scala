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

  /** Neighbor-overlap link prediction — common-neighbor count and Jaccard
    * coefficient |Γ(u) ∩ Γ(v)| / |Γ(u) ∪ Γ(v)| for candidate non-edges at
    * distance 2 (Liben-Nowell & Kleinberg 2003's strongest simple
    * predictors). Complements [[adamicAdar]]: Jaccard normalizes by BOTH
    * endpoints' degrees, so it ranks a pair of low-degree entities sharing
    * most of their (few) neighbors above a hub pair sharing many — the right
    * ordering when the graph mixes head entities with tail entities, which
    * extraction-derived knowledge graphs always do.
    *
    * Same scale spine as [[adamicAdar]]: the wedge table routes through the
    * center and is pruned BEFORE the join by `maxHubDegree` (a degree-d
    * center emits d² wedges); the intersection therefore counts shared
    * neighbors through SURVIVING centers, while the union denominator uses
    * the endpoints' FULL degrees — capped-intersection / full-union, so the
    * reported Jaccard is a lower bound that only tightens as the cap rises
    * (document the cap with the score, never silently). Endpoint degrees
    * arrive via one broadcast of the node-sized degree table AFTER the
    * (u,v) aggregate collapses the wedge table, so the join is output-sized.
    *
    * `edges`: symmetric directed pair list, both directions, no duplicates.
    * Output: (src, dst) with src < dst, `common`, `jaccard` (unrounded —
    * callers round; a count ratio, but DOUBLE division order still matters
    * across engines). */
  def neighborOverlap(edges: DataFrame, maxHubDegree: Int): DataFrame = {
    require(maxHubDegree >= 2, s"maxHubDegree must be >= 2, got $maxHubDegree")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
    val centers = broadcast(deg.filter(col("_d") <= maxHubDegree)
      .select(col("id").as("w")))
    val wedges = e.select(col("src").as("u"), col("dst").as("w"))
      .join(centers, Seq("w"))
      .join(e.select(col("src").as("w"), col("dst").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"))
    val known = e.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    val degB = broadcast(deg)
    scored.join(known, Seq("u", "v"), "left_anti")
      .join(degB.select(col("id").as("u"), col("_d").as("_du")), Seq("u"))
      .join(degB.select(col("id").as("v"), col("_d").as("_dv")), Seq("v"))
      .select(col("u").as("src"), col("v").as("dst"), col("common"),
        (col("common").cast("double") /
          (col("_du") + col("_dv") - col("common"))).as("jaccard"))
  }
}
