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

  /** Newman modularity, reported PER COMMUNITY: for community c over a
    * SYMMETRIC duplicate-free edge list with E directed edges,
    * contrib(c) = Ein_c/E − (D_c/E)², where Ein_c counts directed edges
    * with both endpoints in c and D_c is c's degree sum; Q = Σ contrib.
    * The quality read on [[run]]'s output (or any partition: LPA labels,
    * k-means cells, a manual split) — Q near 0 means the "communities"
    * are no better than random, so downstream consumers (community-scoped
    * dedup, topic-sharded retrieval) should not trust the split.
    *
    * Shape: one edge⋈labels⋈labels join feeding two label-keyed counts, a
    * node count, and a 1-row total folded in as a broadcast — no windows,
    * nothing driver-side. All ratio inputs are exact BIGINTs.
    *
    * Output: (label, n_nodes, n_in_edges directed, deg_sum, contrib). */
  def modularity(labels: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val tot = e.agg(count(lit(1)).cast("double").as("_etot"))
    val j = e
      .join(labels.select(col("id").as("src"), col("label").as("_la")), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("label").as("_lb")), Seq("dst"))
    val ein = j.filter(col("_la") === col("_lb"))
      .groupBy(col("_la").as("label")).agg(count(lit(1)).as("n_in_edges"))
    val dsum = j.groupBy(col("_la").as("label")).agg(count(lit(1)).as("deg_sum"))
    val nn = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val einD = coalesce(col("n_in_edges"), lit(0L)).cast("double")
    val degD = coalesce(col("deg_sum"), lit(0L)).cast("double")
    // left joins: an all-isolated-nodes community (possible when `labels`
    // covers more nodes than `edges`) surfaces with zeros, not a dropped row
    nn.join(dsum, Seq("label"), "left").join(ein, Seq("label"), "left")
      .crossJoin(broadcast(tot))
      .select(col("label"), col("n_nodes"),
        coalesce(col("n_in_edges"), lit(0L)).as("n_in_edges"),
        coalesce(col("deg_sum"), lit(0L)).as("deg_sum"),
        (einD / col("_etot") -
          (degD / col("_etot")) * (degD / col("_etot"))).as("contrib"))
  }

  /** Per-community conductance φ(C) = cut(C) / min(vol(C), vol(G) − vol(C))
    * — [[modularity]]'s sharper companion: modularity rewards a partition
    * globally, conductance grades each community's BOUNDARY (how leaky is
    * this cluster), which is the go/no-go read before community-scoped work
    * (per-community dedup, topic-sharded retrieval) trusts one specific
    * community rather than the whole split. Low φ = tight community; φ near
    * 1 = a random slice.
    *
    * Scale shape: ONE labels⋈edges⋈labels join (pinned — both the volume
    * and cut aggregates read it), then community-sized counts; volumes via
    * the directed-edge count at the source (the edge list carries both
    * directions, so that IS Σ deg over members), total volume as a 1-row
    * broadcast. All ratio inputs exact BIGINTs. Rows drive from the label
    * table, so an all-isolated community surfaces with zeros and a NULL φ
    * (undefined — no volume to leak), never a dropped row.
    *
    * Output: (community, n_nodes, volume, cut_edges, conductance). */
  def conductance(labels: DataFrame, edges: DataFrame): DataFrame = {
    val j = edges.select(col("src"), col("dst"))
      .join(labels.select(col("id").as("src"), col("label").as("_la")), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("label").as("_lb")), Seq("dst"))
      .localCheckpoint(true) // read by the volume, cut, and total aggregates
    val nn = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val vol = j.groupBy(col("_la").as("label")).agg(count(lit(1)).as("volume"))
    val cut = j.filter(col("_la") =!= col("_lb"))
      .groupBy(col("_la").as("label")).agg(count(lit(1)).as("cut_edges"))
    val tot = j.agg(count(lit(1)).as("_vtot"))
    val v = coalesce(col("volume"), lit(0L))
    val c = coalesce(col("cut_edges"), lit(0L))
    val denom = least(v, col("_vtot") - v)
    nn.join(vol, Seq("label"), "left").join(cut, Seq("label"), "left")
      .crossJoin(broadcast(tot))
      .select(col("label").as("community"), col("n_nodes"),
        v.as("volume"), c.as("cut_edges"),
        when(denom > 0, c.cast("double") / denom).as("conductance"))
  }
}
