package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Synchronous label propagation (Raghavan et al. 2007, made deterministic):
  * every node starts as its own label; each round it adopts the most frequent
  * label among its neighbors, ties broken by the SMALLEST label. Synchronous
  * update + total tie order makes the result a pure function of the edge set
  * — no random visit order, so a SQL engine can replay it round for round
  * (asynchronous LPA, the paper's default, is irreproducible by design).
  *
  * Communities, not components: unlike HashMin/stars ([[Dedup]]'s cluster
  * collapse) the mode keeps densely-knit regions separate even when sparse
  * bridges connect them — the curation use is topical grouping of an entity
  * graph (sampling caps per community, mixture audits) where connected
  * components would collapse everything reachable into one blob.
  *
  * Scale shape per round: one edge-sized join against a node-sized label
  * frame, then a two-level aggregate — (dst, label) counts with map-side
  * combine, then a min_by fold per node. No windows (a per-node sort would
  * shuffle the same data a second time), no collects. Rounds are
  * checkpointed; each checkpoint is freed the moment its successor exists
  * (PageRank hygiene). The result derives from the final checkpoint only —
  * long-lived callers free it with `Bridge.unpersistPlanCheckpoints`.
  */
object LabelPropagation {

  /** Run `rounds` synchronous passes over a SYMMETRIC duplicate-free edge
    * list (both directions present — [[PageRank.cooccurrenceEdges]]'s
    * contract). Output: (id, label) for every node with at least one edge. */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var labels = e.select(col("src").as("id"))
      .distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      // Negate the COUNT for the tie-break struct (min over (-count, label)
      // = max count, then min label) — never negate the label, which may be
      // a string in caller graphs.
      val next = e.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("id"))
        .agg(min_by(col("label"), struct((-col("_c")).as("_nc"), col("label"))).as("label"))
        .localCheckpoint(true)
      Bridge.unpersistCheckpoint(labels)
      labels = next
      r += 1
    }
    Bridge.unpersistCheckpoint(e)
    labels
  }
}
