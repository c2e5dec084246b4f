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
    * nothing driver-side. All ratio inputs are exact BIGINTs, and the
    * contribution ships BOTH ways: `contrib` as the double a human reads,
    * and the exact integer rational `contrib_num = n_in·E − deg_sum²` over
    * `contrib_den = E²` — a pure function of counts with zero float
    * surface, so two engines agree bit-for-bit (the m6/m7 engine-exact
    * convention). BIGINT bound: safe while E < 3.0e9 directed edges, and
    * ENFORCED — past it the kernel raises instead of wrapping silently;
    * widen both products to DecimalType(38,0) upstream if a graph ever
    * genuinely exceeds it (the counts themselves stay exact far beyond
    * any real graph).
    *
    * Output: (label, n_nodes, n_in_edges directed, deg_sum, contrib,
    * contrib_num, contrib_den). */
  def modularity(labels: DataFrame, edges: DataFrame): DataFrame =
    modularityImpl(labels, edges.select(col("src"), col("dst"),
      lit(1L).as("_w")))

  /** WEIGHTED Newman modularity — the same per-community contribution with
    * every count replaced by a weight sum: contrib(c) = W_in_c/W −
    * (S_c/W)², W the total directed edge weight, S_c community c's weighted
    * degree. The natural read on a multiplicity graph (the co-occurrence
    * table's `_m`: how MANY orders/documents co-mention the pair) — an
    * unweighted pass treats a 100-order pairing and a 1-order pairing as
    * the same edge, systematically flattening exactly the dense cores a
    * community split is supposed to find (Newman 2004, "Analysis of
    * weighted networks").
    *
    * `weightCol` must be INTEGRAL (BIGINT-safe): the engine-exact rational
    * then survives unchanged — contrib_num = w_in·W − S_c², contrib_den =
    * W², pure integer arithmetic, bit-equal across engines. Same plan
    * shape as [[modularity]]; weights ride the existing aggregates. */
  def modularityWeighted(labels: DataFrame, edges: DataFrame,
      weightCol: String): DataFrame =
    modularityImpl(labels, edges.select(col("src"), col("dst"),
      integralWeight(edges, weightCol).as("_w")))

  /** Fail fast on a fractional weight column: cast("long") would TRUNCATE
    * tf-idf-style doubles toward zero and the kernels would return
    * plausible-looking zeros instead of an error. */
  private def integralWeight(edges: DataFrame, weightCol: String)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    edges.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(weightCol).cast("long")
      case dt => throw new IllegalArgumentException(
        s"weighted kernel: weight column '$weightCol' must be integral " +
          s"(the exact-BIGINT rational contract), got $dt — scale and " +
          "round fractional weights to integers upstream")
    }
  }

  private def modularityImpl(labels: DataFrame, e: DataFrame): DataFrame = {
    val tot = e.agg(sum(col("_w")).as("_etot"))
    val j = e
      .join(labels.select(col("id").as("src"), col("label").as("_la")), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("label").as("_lb")), Seq("dst"))
    val ein = j.filter(col("_la") === col("_lb"))
      .groupBy(col("_la").as("label")).agg(sum(col("_w")).as("n_in_edges"))
    val dsum = j.groupBy(col("_la").as("label")).agg(sum(col("_w")).as("deg_sum"))
    val nn = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val einL = coalesce(col("n_in_edges"), lit(0L))
    val degL = coalesce(col("deg_sum"), lit(0L))
    // ENFORCED exact-BIGINT bound (not just documented): E² and deg_sum²
    // stay under Long.MaxValue while E ≤ 3.03e9 directed weight. Past it the
    // products would wrap silently and the engine-exact rational would be
    // WRONG with no error — raise instead, lazily inside the projection (no
    // extra job; the guard evaluates once per community row).
    val bound = 3000000000L
    val etotG = when(col("_etot") > bound,
      raise_error(concat(
        lit("modularity: total directed edge weight "), col("_etot"),
        lit(s" exceeds the exact-BIGINT bound $bound (E^2 would overflow " +
          "Long); scale integral weights down or widen the rational to " +
          "DecimalType(38,0) upstream"))).cast("long"))
      .otherwise(col("_etot"))
    val num = einL * etotG - degL * degL
    val den = etotG * etotG
    // left joins: an all-isolated-nodes community (possible when `labels`
    // covers more nodes than `edges`) surfaces with zeros, not a dropped row
    nn.join(dsum, Seq("label"), "left").join(ein, Seq("label"), "left")
      .crossJoin(broadcast(tot))
      .select(col("label"), col("n_nodes"),
        einL.as("n_in_edges"), degL.as("deg_sum"),
        (num.cast("double") / den.cast("double")).as("contrib"),
        num.as("contrib_num"), den.as("contrib_den"))
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
  def conductance(labels: DataFrame, edges: DataFrame): DataFrame =
    conductanceImpl(labels, edges.select(col("src"), col("dst"),
      lit(1L).as("_w")))

  /** WEIGHTED conductance φ(C) = cut_w(C) / min(vol_w(C), W − vol_w(C)) —
    * [[conductance]] with every edge counted by its multiplicity: on a
    * co-occurrence graph a community held together by 100-order pairings
    * but cut by 1-order bridges is TIGHT, and the unweighted φ (which
    * scores each bridge equal to each internal bond) overstates its
    * leakage. `weightCol` must be integral; all ratio inputs stay exact
    * BIGINTs. Same single-join plan as [[conductance]]. */
  def conductanceWeighted(labels: DataFrame, edges: DataFrame,
      weightCol: String): DataFrame =
    conductanceImpl(labels, edges.select(col("src"), col("dst"),
      integralWeight(edges, weightCol).as("_w")))

  private def conductanceImpl(labels: DataFrame, e: DataFrame): DataFrame = {
    val j = e
      .join(labels.select(col("id").as("src"), col("label").as("_la")), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("label").as("_lb")), Seq("dst"))
      .localCheckpoint(true) // read by the volume, cut, and total aggregates
    val nn = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val vol = j.groupBy(col("_la").as("label")).agg(sum(col("_w")).as("volume"))
    val cut = j.filter(col("_la") =!= col("_lb"))
      .groupBy(col("_la").as("label")).agg(sum(col("_w")).as("cut_edges"))
    val tot = j.agg(sum(col("_w")).as("_vtot"))
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
