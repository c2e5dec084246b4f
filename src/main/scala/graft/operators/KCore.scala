package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** k-core peeling (Seidman 1983) over a symmetric edge list — the "onion
  * layer" decomposition: repeatedly remove every node whose degree in the
  * SURVIVING graph is < k. The k-core (what remains) is the standard
  * robust-density region; the layer at which a node is peeled is a
  * centrality-adjacent signal (hubs-by-association die late) that a
  * curation pipeline uses to pick seed regions or prune noise tails.
  *
  * Scale shape: each round is one degree aggregate (map-side combined) +
  * two semi-joins of the edge list against the node-sized survivor set —
  * never a collect, never a window. Rounds are checkpointed and superseded
  * checkpoints freed immediately (PageRank hygiene); the RESULT derives
  * from up to one node-sized checkpoint per round, so long-lived callers
  * free it with `Bridge.unpersistPlanCheckpoints(result)` after their last
  * action (the plan-walking free exists precisely for this multi-
  * checkpoint shape).
  */
object KCore {

  /** Peel with fixed `maxRounds` (early exit at fixpoint — identical result,
    * the remaining rounds are no-ops by monotonicity).
    *
    * `edges`: SYMMETRIC directed pair list (both directions present, no
    * duplicates — [[PageRank.cooccurrenceEdges]]'s contract). Output:
    * (id, layer) for every node — layer r ≥ 1 if removed in round r,
    * layer 0 if it survives all rounds (the k-core). */
  def peelLayers(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = edges.localCheckpoint(true)
    var alive = e.select(col("src").as("id")).distinct().localCheckpoint(true)
    var peeled = Vector.empty[DataFrame]
    var converged = false
    var r = 1
    while (r <= maxRounds && !converged) {
      val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
      val removed = alive.join(deg, Seq("id"), "left")
        .filter(coalesce(col("_d"), lit(0L)) < k)
        .select(col("id"), lit(r).as("layer"))
        .localCheckpoint(true)
      if (removed.isEmpty) {
        Bridge.unpersistCheckpoint(removed)
        converged = true
      } else {
        peeled = peeled :+ removed
        val nextAlive = alive.join(removed, Seq("id"), "left_anti").localCheckpoint(true)
        val nextE = e
          .join(nextAlive.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(nextAlive.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
          .localCheckpoint(true)
        Bridge.unpersistCheckpoint(alive)
        Bridge.unpersistCheckpoint(e)
        alive = nextAlive
        e = nextE
        r += 1
      }
    }
    // survivors = the k-core (layer 0); e's final checkpoint no longer feeds
    // anything the result reads
    Bridge.unpersistCheckpoint(e)
    peeled.foldLeft(alive.select(col("id"), lit(0).as("layer")))(_ unionByName _)
  }
}
