package graft.operators

import graft.model.ExpansionStep
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Result of an expansion: the id sets plus the audit log the API exposes
  * (knowledge_graph.py:149-192 SubGraph + expansion_history). */
final case class Subgraph(
    entityIds: DataFrame,   // column: entity_id
    relationIds: DataFrame, // column: relation_id
    history: Seq[ExpansionStep])

/** P1–P6 iterative subgraph expansion (knowledge_graph.py:258-358).
  *
  * Semantics (SURVEY §2.7): init-merge relations(seed entities) ∪ seed relations;
  * then per degree: frontier relations → unseen entities → those entities' unseen
  * relations.
  *
  * Physical shape: the edge table is the big side and NEVER shuffles — each hop
  * is one broadcast semi-join + broadcast anti-join against the (bounded,
  * top-k × degree) working set, ONE Spark job per hop side. The hop result is
  * collected — it is the audit log the API returns anyway (knowledge_graph.py:
  * 293-346), the same boundedness contract as the reference's driver-side id
  * sets — and re-injected as a LOCAL frame, so downstream consumers (eviction
  * semi-join, passage collection) broadcast it without recomputing any hop.
  * Degree-1 retrieval: 4 jobs total (seeds, init, E-hop, R-hop); the previous
  * checkpoint-per-frontier design spent ~10. For traversals whose reached set
  * is NOT bounded (deep degrees on hub-heavy graphs) use [[GraphXExpansion]],
  * which keeps the sets distributed and caps the audit samples.
  */
object SubgraphExpansion {

  /** Default ceiling on the driver-collected working set: the "bounded by
    * top-k × degree" contract really means top-k × degree × fan-out, so a hub
    * entity/relation can make a hop arbitrarily large. Rather than silently
    * OOMing the driver, expansion fails fast past this many ids per collect
    * and points at [[GraphXExpansion]], which keeps the sets distributed. */
  val DefaultMaxWorkingSet: Int = 1 << 20

  def expand(
      seedEntityIds: DataFrame,  // column: entity_id
      seedRelationIds: DataFrame, // column: relation_id
      entityRelation: DataFrame,  // entity_id, relation_id, [role]
      degree: Int,
      maxWorkingSet: Int = DefaultMaxWorkingSet): Subgraph = {

    val spark = entityRelation.sparkSession
    val er = entityRelation.select("entity_id", "relation_id")

    def local(ids: Seq[String], name: String): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(Row(_)), 1),
        StructType(Seq(StructField(name, StringType, nullable = false))))

    // Every driver collect in the loop goes through this guard: fetch at most
    // cap+1 rows (the limit bounds the transfer, not just the check) and fail
    // fast on overflow instead of materializing an unbounded hop.
    def collectBounded(ids: DataFrame, what: String): Seq[String] = {
      val rows = ids.limit(maxWorkingSet + 1).collect()
      if (rows.length > maxWorkingSet)
        throw new IllegalStateException(
          s"subgraph expansion: $what exceeded maxWorkingSet=$maxWorkingSet ids; " +
            "the reached set is not driver-bounded — use GraphXExpansion.expand " +
            "(distributed id sets) or raise maxWorkingSet")
      rows.map(_.getString(0)).sorted.toSeq
    }

    // P1: seed entities (job 1 — the seeds arrive as a distributed KNN result).
    val seedEntityList = collectBounded(
      seedEntityIds.select("entity_id").distinct(), "seed entities")
    var entityList = seedEntityList
    var entitySeen = entityList.toSet
    var entDf = local(entityList, "entity_id")

    // Init-merge (knowledge_graph.py:280-302): relations incident to seed
    // entities ∪ seed relations — one fused job.
    val initRelationList = collectBounded(
      er.join(broadcast(entDf), Seq("entity_id"), "left_semi")
        .select("relation_id")
        .unionByName(seedRelationIds.select("relation_id"))
        .distinct(), "init relations")
    var relationList = initRelationList
    var relationSeen = relationList.toSet
    var relDf = local(relationList, "relation_id")
    var frontierRels = relDf

    val history = Seq.newBuilder[ExpansionStep]
    history += ExpansionStep(0, seedEntityList, initRelationList,
      entityList.size.toLong, relationList.size.toLong)

    // P2/P3/P4 degree loop (knowledge_graph.py:305-346) — two jobs per degree.
    for (d <- 1 to degree) {
      val addedE = collectBounded(
        er.join(broadcast(frontierRels), Seq("relation_id"), "left_semi")
          .select("entity_id").distinct()
          .join(broadcast(entDf), Seq("entity_id"), "left_anti"),
        s"degree-$d entity hop")
      val newEntDf = local(addedE, "entity_id")
      val addedR = collectBounded(
        er.join(broadcast(newEntDf), Seq("entity_id"), "left_semi")
          .select("relation_id").distinct()
          .join(broadcast(relDf), Seq("relation_id"), "left_anti"),
        s"degree-$d relation hop")
      entityList = entityList ++ addedE.filterNot(entitySeen)
      relationList = relationList ++ addedR.filterNot(relationSeen)
      entitySeen ++= addedE
      relationSeen ++= addedR
      entDf = local(entityList, "entity_id")
      relDf = local(relationList, "relation_id")
      frontierRels = local(addedR, "relation_id")
      history += ExpansionStep(d, addedE, addedR,
        entityList.size.toLong, relationList.size.toLong)
    }

    Subgraph(entDf, relDf, history.result())
  }

  /** P5 passage collection: distinct passages of all subgraph relations
    * (knowledge_graph.py:348-356) via the edge table. */
  def collectPassages(relationIds: DataFrame, relationPassage: DataFrame): DataFrame =
    relationPassage.join(broadcast(relationIds.select("relation_id")),
        Seq("relation_id"), "left_semi")
      .select("passage_id").distinct()
}
