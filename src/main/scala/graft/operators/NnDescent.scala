package graft.operators

import graft.functions.{Hashing, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NN-Descent approximate kNN-GRAPH construction (Dong, Charikar & Li,
  * WWW 2011) — the 100 TB path for every consumer of an all-nodes kNN graph
  * (mutual-kNN neighborhoods `sim6`, kNN density `sim8`, embedding dedup
  * clustering): the exact n² pair scan those oracle rows pin is unpayable
  * past ~10⁷ rows, hyperplane blocking (`blockBits`) trades recall for an
  * equi-join, and IVF serves point QUERIES, not the whole graph. NN-descent
  * exploits "my neighbor's neighbor is probably my neighbor": start from a
  * cheap deterministic candidate list per node and iterate LOCAL wedge
  * joins, each node keeping its best k — empirically >0.9 recall within a
  * few rounds at O(n·k²) candidates per round.
  *
  * Determinism (the property every oracle-checked consumer upstream relies
  * on): init candidates come from md5-bucket co-residency (the
  * [[DatasetSplit.bucketOf]] arithmetic, so the whole construction is
  * replicable as plain SQL in the DuckDB oracle — hashing is noise next to
  * the cosine scans it gates), the hub cap samples reverse edges by a pair
  * hash, and every reduction is the same bounded [[TopKAggregator]] the
  * exact paths use (ties to min id) — two runs over any partitioning
  * produce the identical graph, and the `nn1_descent_graph` board row
  * pins rounds=1 edge-for-edge against an unrolled-CTE SQL twin.
  *
  * Shape per round (K = oversample·k, the internal list length): explode
  * the n·K edge list, cap REVERSE degree at K by a deterministic pair-hash
  * top-K (the paper's ρ-sampling; without it a hub node with huge
  * in-degree makes its wedge join quadratic in that in-degree), wedge-join
  * the ≤2K-degree adjacency on the shared anchor (≤ n·(2K choose 2)
  * candidate pairs — the oversample² cost term), distinct, two hash joins
  * back to the pinned vector table, one bounded top-K aggregate. All
  * equi-joins and map-side-combinable aggregates — no global sort, no n²
  * anywhere. Between rounds the state is the n·K top-list frame,
  * localCheckpoint-pinned with the predecessor unpersisted (flat lineage
  * at any round count). Init is bucket-quadratic only WITHIN ~32-node
  * buckets: ~32·n scored pairs, never n².
  *
  * Connectivity (why each round ALSO unions in a fresh seed-r bucketing):
  * a single hash bucketing is a disjoint union of cliques, and wedges of
  * same-bucket neighbors stay in the bucket — the candidate graph would be
  * CLOSED under the iteration and a node whose true neighbors hash
  * elsewhere could never find them (measured: recall frozen at the init
  * value for any round count). The paper's random init is an expander;
  * re-bucketing with seed = round restores that property at the same
  * 32·n-per-round cost — the union of independent random near-uniform
  * partitions mixes across the whole corpus, and a near neighbor found by
  * ANY round's bucketing propagates to the rest of its neighborhood
  * through the wedge joins.
  */
object NnDescent {

  /** Build the directed kNN graph: one row per (id, nbr_id, cosine), each
    * id carrying its approximate top-k by cosine. `rounds = 0` returns the
    * bucket-init graph (useful as the recall baseline).
    *
    * OMISSION NOTE (like labelAgreement's "anchors alone in their block
    * drop out"): a node that never receives a candidate — alone in its
    * seed-0 init bucket at rounds = 0, or alone in EVERY seed-0..r
    * bucketing — gets no top-list row and is ABSENT from the output, not
    * present with zero neighbors. Per-id consumers that must see every
    * node left-join the base ids back (the
    * [[VectorSearch.knnDensityFrom]] `allIds` parameter does exactly
    * that); with ~32-node buckets a singleton bucket needs n < ~64 or a
    * pathological id set, so at corpus scale this is a theoretical edge.
    *
    * `oversample`: internal lists are K = oversample·k long, the final
    * projection keeps each node's top k — the paper's K-vs-k dial and the
    * lever that matters in HIGH INTRINSIC DIMENSION, where "my neighbor's
    * neighbor" transitivity is weak (random 64-dim cosine neighbors sit at
    * 0.3 over a 0.0 background, so a k-sized frontier stalls: measured
    * k=10 recall at 3 rounds on the bench corpus 0.21 at oversample=1).
    * Wedge cost grows as oversample², candidate scoring as oversample·n·k
    * — pay it when the data is flat, drop to 1 when it clusters. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int = 3, oversample: Int = 2): DataFrame = {
    require(k >= 1, s"knnGraph: k must be >= 1, got $k")
    require(rounds >= 0, s"knnGraph: rounds must be >= 0, got $rounds")
    require(oversample >= 1, s"knnGraph: oversample must be >= 1, got $oversample")
    val base = VectorSearch.spreadScan(df
      .select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
      .withColumn("__nm", VectorFunctions.l2Norm(col("__v"))))
      .localCheckpoint(true) // every round's scoring joins read it
    val n = base.count()
    if (n == 0) {
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(base)
      return base.sparkSession.emptyDataFrame
        .withColumn("id", lit(null).cast("string"))
        .withColumn("nbr_id", lit(null).cast("string"))
        .withColumn("cosine", lit(null).cast("double"))
        .limit(0)
    }
    val topk = VectorSearch.topKUdaf(k * oversample)
    val cos = VectorFunctions.cosinePre(col("a.__v"), col("a.__nm"),
      col("b.__v"), col("b.__nm"))
    // (__src, __dst) candidates -> each src's current best-k list
    def scoreAndKeep(cands: DataFrame): DataFrame =
      cands.join(base.as("a"), col("__src") === col("a.__id"))
        .join(base.as("b"), col("__dst") === col("b.__id"))
        .select(col("__src"), col("__dst"), cos.as("__c"))
        .groupBy(col("__src"))
        .agg(topk(col("__dst"), col("__c")).as("__top"))

    // ~32-node hash buckets, all co-resident pairs — deterministic,
    // degree-bounded, and quadratic only within a bucket; a fresh seed per
    // call site (init seed 0, round r seed r) so the union mixes corpus-wide
    val nBuckets = math.max(1L, n / 32L)
    def bucketPairs(seed: Int): DataFrame = {
      val bucketed = base.withColumn("__bkt",
        Hashing.md5Long(concat_ws("|", lit("nnd"), lit(seed), col("__id"))) % nBuckets)
      bucketed.as("a").join(bucketed.as("b"),
          col("a.__bkt") === col("b.__bkt") && col("a.__id") =!= col("b.__id"))
        .select(col("a.__id").as("__src"), col("b.__id").as("__dst"))
    }
    var top = scoreAndKeep(bucketPairs(0)).localCheckpoint(true)

    for (r <- 1 to rounds) {
      val edges = top.select(col("__src"),
        explode(transform(col("__top"), t => t.getField("id"))).as("__dst"))
      // hub cap: reverse edges per anchor sampled down to K by pair hash
      // (deterministic ρ-sampling) so wedge fan-out stays ≤ (2K choose 2)
      val revCapped = edges
        .select(col("__dst").as("__rsrc"), col("__src").as("__rdst"))
        .groupBy(col("__rsrc"))
        .agg(topk(col("__rdst"),
          Hashing.md5Long(concat_ws("|", col("__rsrc"), col("__rdst"))).cast("double")).as("__rt"))
        .select(col("__rsrc").as("__src"),
          explode(transform(col("__rt"), t => t.getField("id"))).as("__dst"))
      val undirected = edges.union(revCapped)
      val wedges = undirected.as("x").join(undirected.as("y"),
          col("x.__src") === col("y.__src") && col("x.__dst") < col("y.__dst"))
        .select(col("x.__dst").as("__src"), col("y.__dst").as("__dst"))
      val cands = edges
        .union(wedges)
        .union(wedges.select(col("__dst").as("__src"), col("__src").as("__dst")))
        .union(bucketPairs(r)) // cross-bucket mixing; see scaladoc
        .filter(col("__src") =!= col("__dst"))
        .distinct()
      val next = scoreAndKeep(cands).localCheckpoint(true)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(top)
      top = next
    }
    // internal lists are K = oversample·k long and already sorted by the
    // aggregator's (-score, id) order; ship each node's first k. `top` is
    // checkpointed, so `base` is no longer reachable from the result plan.
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(base)
    top.select(col("__src").as("id"), explode(slice(col("__top"), 1, k)).as("t"))
      .select(col("id"), col("t.id").as("nbr_id"), col("t.score").as("cosine"))
  }

  /** The EXACT top-k edge frame (src, dst per anchor) on a deterministic
    * 1-in-`sampleMod` anchor sample (xxhash64 bucket): the exact side scans
    * sample × corpus, so cost is n·|sample|, never n². Returned frame is
    * localCheckpoint-pinned — callers comparing several graphs against the
    * same reference compute it ONCE, then [[recallAgainst]] per graph, and
    * unpersist when done (Bridge.unpersistCheckpoint). */
  def exactTopKEdges(df: DataFrame, idCol: String, vecCol: String, k: Int,
      sampleMod: Int = 12): DataFrame = {
    val topk = VectorSearch.topKUdaf(k)
    val base = df.select(col(idCol).cast("string").as("__id"), col(vecCol).as("__v"))
      .withColumn("__nm", VectorFunctions.l2Norm(col("__v")))
      .localCheckpoint(true)
    val anchors = base.filter(pmod(xxhash64(col("__id")), lit(sampleMod)) === 0)
    val cos = VectorFunctions.cosinePre(col("a.__v"), col("a.__nm"),
      col("b.__v"), col("b.__nm"))
    val exact = anchors.as("a").join(base.as("b"), col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").as("__src"), col("b.__id").as("__dst"), cos.as("__c"))
      .groupBy(col("__src"))
      .agg(topk(col("__dst"), col("__c")).as("__top"))
      .select(col("__src"),
        explode(transform(col("__top"), t => t.getField("id"))).as("__dst"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(base)
    exact
  }

  /** Fraction of `exact`'s edges present in `graph` (two bounded counts +
    * one semi-join). NaN when the anchor sample is empty — "unmeasured",
    * never "perfect". */
  def recallAgainst(exact: DataFrame, graph: DataFrame): Double = {
    val got = graph.select(col("id").as("__src"), col("nbr_id").as("__dst"))
    val tot = exact.count()
    val hit = exact.join(got, Seq("__src", "__dst"), "left_semi").count()
    if (tot == 0L) Double.NaN else hit.toDouble / tot
  }

  /** Recall@k of `graph` against the EXACT top-k on a 1-in-`sampleMod`
    * anchor sample — one-shot convenience over [[exactTopKEdges]] +
    * [[recallAgainst]]. NaN when the sample is empty. */
  def recallAtK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      graph: DataFrame, sampleMod: Int = 12): Double = {
    val exact = exactTopKEdges(df, idCol, vecCol, k, sampleMod)
    val r = recallAgainst(exact, graph)
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(exact)
    r
  }
}
