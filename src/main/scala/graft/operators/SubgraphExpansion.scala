package graft.operators

import graft.model.ExpansionStep
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * relations. Driver loops over DataFrames; each hop is a semi-join against the
  * distributed edge table with an `except`(seen) — the frontier is small (bounded by
  * top-k × degree), the edge table is the big side, so each hop is one broadcast
  * semi-join + set difference, never a full-graph materialization. `localCheckpoint`
  * per hop truncates lineage (SURVEY §7.5).
  */
object SubgraphExpansion {

  def expand(
      seedEntityIds: DataFrame,  // column: entity_id
      seedRelationIds: DataFrame, // column: relation_id
      entityRelation: DataFrame,  // entity_id, relation_id, [role]
      degree: Int): Subgraph = {

    val er = entityRelation.select("entity_id", "relation_id")
    // Checkpoint every frontier frame: it truncates the iterative lineage AND
    // keeps downstream consumers (passage collection, eviction semi-joins, the
    // audit collects) from re-deriving hop joins. Measured: skipping these for
    // degree-1 made the end-to-end pipeline ~20% slower.
    val cp = (df: DataFrame) => df.localCheckpoint(true)

    // P1 + init-merge (knowledge_graph.py:280-302): relations incident to seed
    // entities, unioned with seed relations.
    var entities = cp(seedEntityIds.select("entity_id").distinct())
    val seedRels = seedRelationIds.select("relation_id").distinct()
    val incident = er.join(broadcast(entities), Seq("entity_id"), "left_semi")
      .select("relation_id").distinct()
    var relations = cp(incident.union(seedRels).distinct())

    // The audit log doubles as the count source: id lists are collected anyway
    // (they are bounded by top-k × degree), so set sizes are pure arithmetic —
    // no extra count() jobs.
    val history = Seq.newBuilder[ExpansionStep]
    val seedEntityList = sortedIds(entities, "entity_id")
    val initRelationList = sortedIds(relations, "relation_id")
    var entityTotal = seedEntityList.size.toLong
    var relationTotal = initRelationList.size.toLong
    history += ExpansionStep(0, seedEntityList, initRelationList, entityTotal, relationTotal)

    // P2/P3/P4 degree loop (knowledge_graph.py:305-346).
    for (d <- 1 to degree) {
      // relations → their endpoint entities not yet seen
      val newEntities = cp(er.join(broadcast(relations), Seq("relation_id"), "left_semi")
        .select("entity_id").distinct()
        .except(entities))
      // new entities → their incident relations not yet seen
      val newRelations = cp(er.join(broadcast(newEntities), Seq("entity_id"), "left_semi")
        .select("relation_id").distinct()
        .except(relations))
      entities = cp(entities.union(newEntities))
      relations = cp(relations.union(newRelations))
      val addedE = sortedIds(newEntities, "entity_id")
      val addedR = sortedIds(newRelations, "relation_id")
      entityTotal += addedE.size
      relationTotal += addedR.size
      history += ExpansionStep(d, addedE, addedR, entityTotal, relationTotal)
    }

    Subgraph(entities, relations, history.result())
  }

  /** P5 passage collection: distinct passages of all subgraph relations
    * (knowledge_graph.py:348-356) via the edge table. */
  def collectPassages(relationIds: DataFrame, relationPassage: DataFrame): DataFrame =
    relationPassage.join(broadcast(relationIds.select("relation_id")),
        Seq("relation_id"), "left_semi")
      .select("passage_id").distinct()

  private def sortedIds(df: DataFrame, col0: String): Seq[String] =
    df.select(col0).collect().map(_.getString(0)).sorted.toSeq
}
