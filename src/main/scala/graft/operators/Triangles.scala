package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list, degree-ordered.
  *
  * Graph-shape analysis for the entity graph the builder produces (clustering
  * structure = how "webby" the extracted knowledge is) and for any
  * co-occurrence graph a curation pipeline derives. The naive approach —
  * join edges with edges with edges — enumerates every PATH of length 2
  * (sum of deg² wedges), which a single high-degree hub makes quadratic.
  *
  * The standard distributed fix (Schank–Wagner orientation; the shape
  * GraphX's TriangleCount and Cohen's MapReduce formulation both use):
  * orient every undirected edge from its lower-(degree, id) endpoint to the
  * higher one. Every node's OUT-degree in the oriented graph is O(√m), so
  * wedge enumeration — the self-join on the oriented source — is bounded by
  * Σ outdeg² ≤ m·√m total, independent of hub skew. Each triangle is
  * generated exactly once, at its lowest-(degree, id) corner.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * `edges`: undirected (srcCol, dstCol) pairs, any order/duplication —
    * canonicalized and deduped here; self-loops dropped. Output:
    * (node, n_triangles) for every node in ≥1 triangle (triangle-free nodes
    * are absent, same as the SQL oracle's GROUP BY over triangle corners).
    *
    * Plan shape: the canonical edge list fans out to four consumers (degree
    * agg, two orientation lookups, the closing-edge join), so it is
    * materialized once; everything downstream is equi-joins and one final
    * count aggregate — no windows, no collects. */
  def perNodeCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    perNodeCountsCanon(canonicalize(edges, srcCol, dstCol))

  /** Canonical undirected edge list (u < v, self-loops dropped, deduped),
    * eagerly checkpointed — read by several downstream consumers. */
  private def canonicalize(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = edges
    .select(least(col(srcCol), col(dstCol)).as("u"),
      greatest(col(srcCol), col(dstCol)).as("v"))
    .filter(col("u") =!= col("v"))
    .distinct()
    .localCheckpoint(true)

  private def perNodeCountsCanon(canon: DataFrame): DataFrame = {
    // degree of each node in the undirected graph
    val deg = canon.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))

    // orient each edge from lower (degree, id) to higher — total order, so
    // exactly one direction survives per edge
    val oriented = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"))

    // wedges at the lowest corner (src shared; dst pair ordered by id, so
    // each wedge is emitted once AND (u, v) is already canonical for the
    // closing-edge semi-join)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("u"), col("e2.dst").as("v"))
    val triangles = wedges.join(canon, Seq("u", "v"), "left_semi")

    triangles
      .select(explode(array(col("x"), col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node: c(v) = 2·T(v) / (deg(v)·(deg(v)−1))
    * — the fraction of a node's neighbor pairs that are themselves connected.
    * The graph-shape read behind [[perNodeCounts]]: a high-coefficient entity
    * sits in a dense clique-ish neighborhood (one topic, safe to expand
    * through), a low-coefficient high-degree node is a star hub bridging
    * unrelated contexts (the expansion-explosion nodes P4's working-set cap
    * exists for). Watts–Strogatz definition; nodes with degree < 2 have no
    * neighbor pair and score 0 by convention.
    *
    * Same plan as [[perNodeCounts]] plus one edge-sized degree aggregate and
    * a node-sized left join — triangle-free nodes surface with 0 triangles
    * rather than disappearing. Both factors of the ratio are exact BIGINTs,
    * so the single double division is engine-exact.
    *
    * Output: (node, degree, n_triangles, coeff) for every node with ≥1 edge. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    ccFromCanon(canonicalize(edges, srcCol, dstCol))

  private def degFromCanon(canon: DataFrame): DataFrame =
    canon.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  private def ccFromCanon(canon: DataFrame): DataFrame =
    degFromCanon(canon).join(perNodeCountsCanon(canon), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .as("coeff"))

  /** Per-edge triangle support over a canonical (u < v) edge list: the
    * number of triangles the edge closes. Every edge surfaces, zeros
    * included (the truss peel must see unsupported edges to remove them). */
  private def edgeSupportCanon(canon: DataFrame): DataFrame = {
    val deg = canon.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    val tri = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("tu"), col("e2.dst").as("tv"))
      .join(canon.select(col("u").as("tu"), col("v").as("tv")), Seq("tu", "tv"), "left_semi")
    val sup = tri.select(explode(array(
        struct(least(col("x"), col("tu")).as("u"), greatest(col("x"), col("tu")).as("v")),
        struct(least(col("x"), col("tv")).as("u"), greatest(col("x"), col("tv")).as("v")),
        struct(col("tu").as("u"), col("tv").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
    canon.join(sup, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("support"), lit(0L)).as("support"))
  }

  /** k-TRUSS peel layers (Cohen 2008): iteratively remove edges closing
    * fewer than k−2 triangles, recomputing support each round — the
    * EDGE-cohesion decomposition one level above [[graft.operators.KCore]]'s
    * node degrees (an edge can join two high-degree nodes and still bridge
    * unrelated regions; truss support sees through that because bridges
    * close no triangles). The curation read: k-truss edges are the
    * relationships multiple independent contexts corroborate — the safe
    * spine for expansion — while layer-1 edges are single-source hearsay.
    *
    * `rounds` is FIXED, not run-to-convergence (the g12/g13 contract: a SQL
    * oracle replays fixed rounds exactly; truss converges fast in practice
    * and survivors of round r are a superset of the true k-truss that
    * shrinks monotonically with r). Per round: one degree-ordered triangle
    * enumeration (hub-skew-bounded, the [[perNodeCounts]] kernel), one
    * edge-keyed count, one anti-join — survivors checkpointed, the
    * predecessor freed (PageRank hygiene). Removed layers accumulate as a
    * union of per-round frames, each output-sized.
    *
    * Output: (u, v, layer, support) for EVERY input edge — layer = removal
    * round (1-based), 0 for survivors; support = the edge's triangle count
    * at removal time (for survivors: on the final surviving set). */
  def trussPeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"trussPeel: k must be >= 3, got $k")
    require(rounds >= 1, s"trussPeel: rounds must be >= 1, got $rounds")
    var cur = canonicalize(edges, srcCol, dstCol)
    // each round's DROP list is the frame that gets checkpointed: the
    // triangle-enumeration DAG then materializes exactly ONCE per round
    // (both the next-edge anti-join and the output union read the pinned
    // drop, never the lazy support plan), and the per-round drop frames
    // are output-sized, so keeping them all pinned until the result is
    // consumed is the cheapest correct lifetime
    var drops = List.empty[DataFrame]
    var r = 1
    while (r <= rounds) {
      val drop = edgeSupportCanon(cur).filter(col("support") < k - 2)
        .select(col("u"), col("v"), lit(r).as("layer"), col("support"))
        .localCheckpoint(true)
      val next = cur.join(drop.select(col("u"), col("v")), Seq("u", "v"), "left_anti")
        .localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(cur)
      drops ::= drop
      cur = next
      r += 1
    }
    val survivors = edgeSupportCanon(cur)
      .select(col("u"), col("v"), lit(0).as("layer"), col("support"))
    drops.foldLeft(survivors)(_.unionByName(_))
  }

  /** Per-node ego-network feature vector — the structural features a
    * graph-ML pipeline (link prediction, node classification, GNN label
    * bootstrapping) computes for EVERY node before any model sees the graph:
    * degree, triangle count, local clustering coefficient
    * ([[clusteringCoefficient]]) plus average neighbor degree (the
    * assortativity read: a low-degree node with high-degree neighbors sits
    * on a hub's rim, not in a backwater). One canonical edge materialization
    * feeds all four; avg neighbor degree is one direction-expanded
    * edge⋈degree join + a mean of exact integers.
    *
    * Output: (node, degree, n_triangles, coeff, avg_nbr_deg). */
  def egoFeatures(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = canonicalize(edges, srcCol, dstCol)
    val deg = degFromCanon(canon)
    val dirEdges = canon.select(col("u").as("_a"), col("v").as("_b"))
      .unionByName(canon.select(col("v").as("_a"), col("u").as("_b")))
    val nbr = dirEdges
      .join(deg.select(col("node").as("_b"), col("degree").as("_nd")), Seq("_b"))
      .groupBy(col("_a").as("node"))
      .agg(avg(col("_nd").cast("double")).as("avg_nbr_deg"))
    ccFromCanon(canon).join(nbr, Seq("node"))
  }
}
