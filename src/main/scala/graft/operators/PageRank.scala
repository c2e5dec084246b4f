package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
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
    // collect_set + double explode, NOT a self-join: the aggregate moves each
    // input row once (map-side combined) where the join would shuffle the
    // table twice and hash-probe it; pair fan-out happens after, narrowly.
    // Dedup runs on the CANONICAL (src < dst) half only — half the distinct's
    // shuffle volume — then both directions fan out of each surviving row via
    // one generator (NOT a self-union, which would re-evaluate the subplan).
    val canon = df.groupBy(col(groupCol))
      .agg(collect_set(col(itemCol)).as("_items"))
      .select(explode(col("_items")).as("src"), col("_items"))
      .select(col("src"), explode(col("_items")).as("dst"))
      .filter(col("src") < col("dst"))
      .distinct()
    canon.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** [[cooccurrenceEdges]] restricted to pairs co-occurring in at least
    * `minGroups` DISTINCT groups — the standard sparsifier for dense
    * co-occurrence graphs (a single shared group is mostly noise; repeated
    * co-occurrence is signal). Multiplicity = distinct groups, same as the
    * collect_set base (duplicate items within one group count once).
    * Same scale shape, with the count folded into the pair-dedup aggregate. */
  def cooccurrenceEdgesMinCount(df: DataFrame, groupCol: String, itemCol: String,
      minGroups: Int): DataFrame = {
    val canon = df.groupBy(col(groupCol))
      .agg(collect_set(col(itemCol)).as("_items"))
      .select(explode(col("_items")).as("src"), col("_items"))
      .select(col("src"), explode(col("_items")).as("dst"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("_m"))
      .filter(col("_m") >= minGroups)
    canon.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** Run `iterations` damped PageRank passes over `edges` (columns `src`,
    * `dst`; duplicates must already be removed — they would double-count).
    * Returns (`id`, `pr`) for every node with at least one out-edge.
    *
    * The rank vector (one row per node) is BROADCAST each iteration — right
    * up to graphs of a few tens of millions of nodes, where edge tables (the
    * actually-large side, touched once per iteration with zero exchanges
    * here) are in the billions. Past `maxBroadcastNodes` the call hands off
    * to [[runBig]] (GraphX — both sides co-partitioned, nothing broadcast),
    * so a billion-node entity graph runs the same API; this DataFrame form
    * optimizes the overwhelmingly common regime. */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      maxBroadcastNodes: Long = 20000000L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping >= 0.0 && damping <= 1.0,
      s"damping must be in [0, 1], got $damping")
    // The edge list is materialized FIRST: everything below reads it at least
    // twice (degree aggregate + weighting join), and an un-pinned edge frame
    // would re-run the caller's whole pipeline (for [[cooccurrenceEdges]], a
    // corpus-sized aggregate + distinct) once per branch — measured as the
    // dominant cost of the whole operator. Standard lineage-truncation move
    // for iterative algorithms.
    val e = edges.localCheckpoint(true)
    // Degrees are node-sized — checkpointed once, they double as the node
    // set (free) and broadcast into the weighting join (no edge shuffle).
    val deg = e.groupBy("src").agg(count(lit(1)).as("_d")).localCheckpoint(true)
    val nodes = deg.select(col("src").as("id"))
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("pr", lit(0.0))
    // Regime check BEFORE the weighted-edge build: past the broadcast bound
    // that full-edge shuffle would be materialized only to be abandoned for
    // the GraphX path (which derives degrees itself).
    if (n > maxBroadcastNodes) return runBig(e, iterations, damping)
    // Degree-weighted edges (src, dst, invdeg): built once, PRE-PARTITIONED
    // on dst — the aggregation key of every iteration — then checkpointed.
    // localCheckpoint preserves the partitioning, so each iteration's
    // broadcast-join + groupBy(dst) plans with NO exchange at all: the only
    // per-iteration data motion is the node-sized broadcast.
    val weighted = e.join(broadcast(deg), Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("_d")).as("_invdeg"))
      .repartition(col("dst"))
      .localCheckpoint(true)

    // e's blocks are no longer read once weighted is materialized
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(e)
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contribs = weighted
        .join(broadcast(ranks), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("_invdeg")).as("_c"))
        .select(col("dst").as("id"), col("_c"))
      val next = nodes.join(broadcast(contribs), Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_c"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      // superseded iteration checkpoints would otherwise pin one node-sized
      // block set PER ITERATION for the life of the session (stars-CC
      // hygiene, extended here by the r8 review); iteration 1's "ranks" is
      // the un-checkpointed init frame — nothing to free
      if (i > 1) org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(ranks)
      ranks = next
    }
    if (iterations > 0) {
      // the final ranks checkpoint is self-contained: the setup frames only
      // fed the loop and can release their blocks with the result alive
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(weighted)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(deg)
    }
    ranks
  }

  /** Edge-WEIGHTED PageRank: transition probability src→dst is
    * w(src,dst)/Σw(src,·) instead of 1/outdeg — on a co-occurrence graph
    * the weights are the multiplicities [[graft.SparkEntry.coPairs]] already
    * carries, so strongly co-occurring neighbors receive proportionally more
    * rank than incidental ones (the same signal [[ShortestPaths]] uses as
    * inverse distance). Same zero-exchange plan as [[run]]: normalized
    * edges built once, pre-partitioned on dst, checkpointed; per iteration
    * ONE node-sized broadcast join + one map-side-combined aggregation.
    * Dangling mass is dropped, not redistributed (the [[run]] convention).
    * `edges(src, dst, w)` with positive weights; for node sets past the
    * broadcast bound use [[runBig]] on the unweighted graph or shard the
    * rank vector. */
  def runWeighted(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("_w"))
      .localCheckpoint(true)
    val wout = e.groupBy("src").agg(sum("_w").as("_wd")).localCheckpoint(true)
    val nodes = wout.select(col("src").as("id"))
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("pr", lit(0.0))
    val weighted = e.join(broadcast(wout), Seq("src"))
      .select(col("src"), col("dst"), (col("_w") / col("_wd")).as("_tw"))
      .repartition(col("dst"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(e)
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contribs = weighted
        .join(broadcast(ranks), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("_tw")).as("_c"))
        .select(col("dst").as("id"), col("_c"))
      val next = nodes.join(broadcast(contribs), Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("_c"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      if (i > 1) org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(ranks)
      ranks = next
    }
    if (iterations > 0) {
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(weighted)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(wout)
    }
    ranks
  }

  /** Personalized PageRank: teleport mass returns to a SEED set instead of
    * uniformly — importance RELATIVE to a query's entity hits, the centrality
    * a graph-RAG retriever actually wants when ranking an expanded subgraph
    * (global PageRank promotes hub entities regardless of the question).
    *
    *   rank_0(v) = t(v),  rank_i(v) = (1-d)·t(v) + d·Σ contribs
    *   t(v) = 1/|S∩nodes| for seeds, 0 elsewhere
    *
    * Same plan shape as [[run]]: weighted edges checkpointed once and
    * pre-partitioned on dst, per-iteration = one node-sized broadcast join +
    * one map-side-combined aggregation; the teleport vector rides the
    * (node-sized, checkpointed) node frame. Seeds outside the node set are
    * ignored; at least one seed must survive. */
  def personalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping >= 0.0 && damping <= 1.0,
      s"damping must be in [0, 1], got $damping")
    val e = edges.localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("_d")).localCheckpoint(true)
    val seedSet = seeds.toDF("id").distinct()
    val nodes = deg.select(col("src").as("id"))
      .join(broadcast(seedSet.withColumn("_m", lit(1))), Seq("id"), "left")
      .localCheckpoint(true) // node-sized; carries the teleport membership
    val s = nodes.filter(col("_m").isNotNull).count()
    require(s > 0, "personalized PageRank needs >= 1 seed with an out-edge")
    val tel = when(col("_m").isNotNull, lit(1.0 / s)).otherwise(lit(0.0))
    val weighted = e.join(broadcast(deg), Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("_d")).as("_invdeg"))
      .repartition(col("dst"))
      .localCheckpoint(true)
    // e and deg fed only the (now-materialized) nodes and weighted frames —
    // free them so a long-lived retriever calling this per query doesn't
    // accumulate pinned setup blocks (r8 review; same hygiene as [[run]])
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(e)
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(deg)
    var ranks = nodes.select(col("id"), tel.as("pr"))
    for (i <- 1 to iterations) {
      val contribs = weighted
        .join(broadcast(ranks), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("_invdeg")).as("_c"))
        .select(col("dst").as("id"), col("_c"))
      val next = nodes.join(broadcast(contribs), Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * tel +
            lit(damping) * coalesce(col("_c"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      if (i > 1) org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(ranks)
      ranks = next
    }
    if (iterations > 0) {
      // final ranks checkpoint is self-contained; nodes still backs the
      // iteration-0 frame only when the loop never ran
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(weighted)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(nodes)
    }
    ranks
  }

  /** GraphX backend for node counts past the broadcast regime: the same
    * damped fixed-iteration semantics as [[run]], executed with
    * `aggregateMessages` over a co-partitioned property graph — nothing
    * node-sized is broadcast or collected, so a billion-node graph works.
    *
    * NOT delegated to `staticPageRank`: Spark's built-in normalizes final
    * ranks to sum to the vertex count (verified empirically), silently
    * rescaling the result; this loop runs the exact [[run]] recurrence
    * (init 1/N, rank = (1−d)/N + d·Σ contrib) with the same per-edge
    * 1/outdeg weights. Same output contract: (id, pr) for nodes with ≥1
    * out-edge, dangling mass dropped — and the id column KEEPS the caller's
    * type (the internal long-vertex-id mapping via zipWithUniqueId is joined
    * back out), so run()'s handoff never changes the result schema. */
  def runBig(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping >= 0.0 && damping <= 1.0,
      s"damping must be in [0, 1], got $damping")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"))
    val outNodes = e.select(col("src").as("name")).distinct().localCheckpoint(true)
    val n = outNodes.count()
    if (n == 0)
      return outNodes.select(col("name").as("id"), lit(0.0).as("pr"))
    val names = e.select(col("src").as("name"))
      .union(e.select(col("dst").as("name"))).distinct()
    val idMap = spark.createDataFrame(
      names.rdd.zipWithUniqueId().map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i)
      },
      org.apache.spark.sql.types.StructType(Seq(
        names.schema.head.copy(name = "name"),
        org.apache.spark.sql.types.StructField("vid",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .localCheckpoint(true) // feeds both edge-endpoint joins + the join-back
    val edgeRdd = e
      .join(idMap.toDF("src", "svid"), "src")
      .join(idMap.toDF("dst", "dvid"), "dst")
      .select($"svid".as[Long], $"dvid".as[Long])
      .rdd.map { case (s, d) => Edge(s, d, ()) }
    // edge weight 1/outdeg(src) once; vertex attr = rank, seeded 1/N (the
    // value only matters for out-degree nodes — dangling vertices never send
    // and are dropped from the output)
    val base = Graph.fromEdges(edgeRdd, ())
    var g: Graph[Double, Double] = base
      .outerJoinVertices(base.outDegrees) { (_, _, d) => d.getOrElse(0) }
      .mapTriplets(t => 1.0 / t.srcAttr)
      .mapVertices((_, _) => 1.0 / n)
    g.cache()
    for (_ <- 1 to iterations) {
      val prev = g
      val contribs = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr * ctx.attr), _ + _)
      g = g.outerJoinVertices(contribs) { (_, _, c) =>
        (1.0 - damping) / n + damping * c.getOrElse(0.0)
      }
      g.cache()
      g.vertices.count() // materialize before dropping the previous step
      prev.unpersist(blocking = false)
    }
    spark.createDataFrame(g.vertices).toDF("vid", "pr")
      .join(idMap, "vid")
      .join(outNodes, Seq("name"), "left_semi")
      .select(col("name").as("id"), col("pr"))
  }
}
