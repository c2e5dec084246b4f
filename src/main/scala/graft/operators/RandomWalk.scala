package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random walks over a symmetric edge list — the sampling
  * kernel behind DeepWalk/node2vec-style graph embeddings (Perozzi et al.
  * 2014): each walk emits the (node, context) positive pairs a skip-gram
  * embedding trains on. The graph-RAG use is entity-embedding pre-training
  * over the extracted knowledge graph — the reference only embeds entity
  * TEXT (embedding/embedder.py), so structural embeddings over its graph
  * are a scale-pipeline addition; walks are also the standard sampler for
  * GNN neighborhoods (GraphSAGE) and for approximating visiting
  * distributions without materializing multi-hop joins.
  *
  * Determinism: the "random" next-hop choice is the argmin of
  * md5(walkId ‖ step ‖ cur ‖ candidate) over the current node's neighbors
  * — a per-(walk, step) uniform draw that is reproducible across engines,
  * partitionings and retries (the same derandomization contract as A-ES
  * sampling in [[CorpusOps]]: hash-keyed order statistics instead of an
  * RNG stream, which would be partition-order-dependent on a cluster).
  *
  * Scale shape (the part that must survive 100 TB of edges):
  *  - each step is ONE equi-join of the walk frontier (one row per live
  *    walk) against the edge list on the current node, followed by a
  *    per-walk min — partial-aggregated map-side, so the shuffle carries
  *    one row per (walk, candidate) pre-combine and one row per walk
  *    post-combine, never the edge list. Walk state never leaves the
  *    executors; nothing is collected.
  *  - the frontier is checkpointed per step (it is read by the next hop
  *    AND the output union; an uncheckpointed lineage would re-run every
  *    prefix once per consumer — the [[SubgraphExpansion]] per-hop
  *    contract, measured there).
  *  - walks at a node with no out-edges simply end (inner join drops
  *    them); a symmetric edge list never strands a seeded walk.
  *  - ties on the hash are broken by the smaller candidate id, making the
  *    argmin a total order even under (astronomically unlikely) md5
  *    collisions.
  *
  * `edges`: symmetric directed pair list, both directions present, no
  * duplicates ([[PageRank.cooccurrenceEdges]]'s contract). `seeds`: one
  * `node` column; one walk starts at each distinct seed, identified by it.
  * Output: (walk_id, step, node) — step 0 is the seed row.
  */
object RandomWalk {

  def walks(edges: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    // Scanned once per hop; pin so hops don't rescan the upstream plan.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var frontier = seeds.select(col("node")).distinct()
      .select(col("node").as("walk_id"), col("node"))
      .localCheckpoint(true)
    var out = frontier.select(col("walk_id"), lit(0).as("step"), col("node"))
    for (step <- 1 to steps) {
      val h = md5(concat_ws("-",
        col("walk_id").cast("string"), lit(step.toString),
        col("node").cast("string"), col("dst").cast("string")))
      frontier = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("walk_id"), struct(h.as("_h"), col("dst")).as("_c"))
        .groupBy(col("walk_id"))
        .agg(min(col("_c")).as("_c")) // (hash, dst) struct min = hash argmin, id tiebreak
        .select(col("walk_id"), col("_c.dst").as("node"))
        .localCheckpoint(true)
      out = out.unionByName(
        frontier.select(col("walk_id"), lit(step).as("step"), col("node")))
    }
    out
  }

  /** Second-order biased walks — node2vec (Grover & Leskovec 2016): the
    * next hop is drawn with weight `wReturn` for stepping BACK to the
    * previous node, `wInner` for a candidate also adjacent to the previous
    * node (staying in the triangle — BFS-ish), and `wOuter` for everything
    * else (leaving the neighborhood — DFS-ish). node2vec's (1/p, 1, 1/q)
    * triple scaled to a common integer denominator by the caller (e.g.
    * p=4, q=2 → (1, 4, 2)); INTEGER weights are the determinism contract.
    *
    * Derandomized weighted choice, cross-engine exact: per (walk, step) the
    * candidates are cum-summed in dst order (integer window sum), a draw is
    * taken as `md5_60bit(walk‖step‖prev‖cur) mod total_weight` — an exact integer (60 draw bits so totals beyond 2³² stay reachable)
    * in [0, total) — and the chosen hop is the smallest dst whose running
    * cum exceeds the draw (inverse-CDF sampling with an integer CDF). No
    * float, no RNG stream: the same candidate multiset yields the same hop
    * on any engine or partitioning, and the SQL twin replays it with two
    * window sums per step. (The first hop has prev = seed = cur, making
    * every candidate `wInner` — a uniform draw, node2vec's own start rule.)
    *
    * Scale shape: per step, ONE equi-join frontier⋈edges on the current
    * node, ONE membership left-join against edges on (prev, dst) for the
    * triangle test, two walk-partitioned window sums over candidate sets
    * (bounded by max degree), and a per-walk min — state is one row per
    * walk, checkpointed per step; the edge list is pinned once. Nothing is
    * collected, nothing is quadratic.
    *
    * Output: (walk_id, step, node), step 0 = seed — the same schema as
    * [[walks]], so [[skipGramPairs]] composes unchanged (the full node2vec
    * training-data pipeline: biased walks → skip-gram pairs).
    *
    * `edgeWeightCol`: optional INTEGER edge multiplicity/weight column on
    * `edges` (e.g. co-occurrence counts) — the hop probability becomes
    * bias-class-weight × edge-weight, node2vec's weighted-graph form
    * (π = α_pq(t,x)·w_tx). Stays all-integer, so the determinism and
    * SQL-replay contracts are unchanged. Weights must be >= 1 by caller
    * contract (0 makes the edge unpickable -- the cum never crosses on
    * it; negatives are undefined). */
  def biasedWalks(edges: DataFrame, seeds: DataFrame, steps: Int,
                  wReturn: Long, wInner: Long, wOuter: Long,
                  edgeWeightCol: Option[String] = None): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(wReturn >= 1 && wInner >= 1 && wOuter >= 1,
      s"integer weights must be >= 1, got ($wReturn, $wInner, $wOuter)")
    val e = edges.select(col("src") +: col("dst") +:
        edgeWeightCol.map(c => col(c).cast("long").as("_ew")).toSeq: _*)
      .localCheckpoint(true)
    val adj = e.select(col("src").as("_as"), col("dst").as("_ad"))
    var frontier = seeds.select(col("node")).distinct()
      .select(col("node").as("walk_id"), col("node").as("prev"), col("node"))
      .localCheckpoint(true)
    var out = frontier.select(col("walk_id"), lit(0).as("step"), col("node"))
    val byWalk = Window.partitionBy(col("walk_id"))
    val cumW = byWalk.orderBy(col("dst"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (step <- 1 to steps) {
      val cand = frontier
        .join(e, frontier("node") === e("src"))
        .join(adj, col("_as") === col("prev") && col("_ad") === col("dst"),
          "left")
        .select(col("walk_id"), col("prev"), col("node"), col("dst"),
          (when(col("dst") === col("prev"), lit(wReturn))
            .when(col("_ad").isNotNull, lit(wInner))
            .otherwise(lit(wOuter)) *
            (if (edgeWeightCol.isDefined) col("_ew") else lit(1L))).as("_w"))
      val drawn = cand
        .withColumn("_cum", sum(col("_w")).over(cumW))
        .withColumn("_draw", graft.functions.Hashing.md5Long60(concat_ws("-",
          col("walk_id").cast("string"), lit(step.toString),
          col("prev").cast("string"), col("node").cast("string")))
          % sum(col("_w")).over(byWalk))
      frontier = drawn.filter(col("_cum") > col("_draw"))
        // cum is strictly increasing in dst order (weights >= 1), so the
        // min dst among crossings IS the inverse-CDF first crossing.
        .groupBy(col("walk_id"))
        .agg(min(col("node")).as("prev"), min(col("dst")).as("node"))
        .localCheckpoint(true)
      out = out.unionByName(
        frontier.select(col("walk_id"), lit(step).as("step"), col("node")))
    }
    out
  }

  /** Skip-gram training pairs from [[walks]] output — the (center, context)
    * multiset a DeepWalk/node2vec embedding actually trains on: every
    * ordered pair of nodes co-occurring within `window` positions on the
    * same walk, with its occurrence count (word2vec's positive-sample
    * frequency). This is the missing half of the graph-embedding data
    * pipeline: `walks` samples the corpus, this turns it into training rows.
    *
    * Scale shape: ONE self-equi-join on walk_id. A walk has at most
    * (steps+1) rows, so the join fans out to ≤ (steps+1)·2·window rows per
    * walk — a small constant per walk, linear in the walk count; the pair
    * count aggregate partial-combines map-side, so the second shuffle
    * carries one row per distinct (center, context) per map task, never the
    * raw pair stream. Both shuffles are hash equi-joins/aggs — partitioned,
    * codegen'd, AQE-planned; nothing is collected. Counts are integer sums:
    * order-free, exact, cross-engine reproducible.
    *
    * Output: (center, context, pair_count), both directions present
    * (skip-gram windows are symmetric), center ≠ context rows only when the
    * walk visits distinct nodes — a revisited node CAN legitimately pair
    * with itself (cycle of length ≤ window), matching word2vec, which does
    * not special-case repeated tokens. */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val a = walks.select(
      col("walk_id").as("_w"), col("step").as("_sa"), col("node").as("center"))
    val b = walks.select(
      col("walk_id").as("_wb"), col("step").as("_sb"), col("node").as("context"))
    a.join(b, col("_w") === col("_wb") && col("_sb") =!= col("_sa") &&
        abs(col("_sb") - col("_sa")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("pair_count"))
  }
}
