package graft.operators

import graft.model.ExpansionStep
import org.apache.spark.graphx.{Edge, EdgeDirection, Graph, VertexId}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** GraphX/Pregel implementation of P1–P6 subgraph expansion — the deep-traversal
  * alternative to [[SubgraphExpansion]]'s driver loop (SURVEY §7.4: the loop
  * suffices for degree ≤ 2; Pregel is the path for deeper traversals, where a
  * per-hop driver loop would accumulate scheduling overhead and lineage).
  *
  * Model: a bipartite graph of entity and relation vertices with an edge per
  * (entity, relation) incidence. One reference "degree" = two BFS layers
  * (relations → entities → relations), so Pregel runs 2×degree supersteps from
  * the init set (relations incident to seed entities ∪ seed relations), with
  * seed entities pre-marked visited. Vertex state = BFS layer (Int.MaxValue =
  * unreached); messages = min layer proposal; the graph is partitioned once and
  * messages flow along edges — no per-hop shuffling of the edge table.
  *
  * Returns the same [[Subgraph]] shape (entity/relation id frames + audit log
  * with per-layer additions).
  */
object GraphXExpansion {

  def expand(
      seedEntityIds: DataFrame,
      seedRelationIds: DataFrame,
      entityRelation: DataFrame,
      degree: Int): Subgraph = {
    val spark = entityRelation.sparkSession
    import spark.implicits._

    val er = entityRelation.select("entity_id", "relation_id").distinct()

    // Stable string->long vertex ids (entities even, relations odd).
    val entVerts = er.select($"entity_id".as("name")).distinct()
      .rdd.map(_.getString(0)).zipWithUniqueId().map { case (n, i) => (n, i * 2) }
    val relVerts = er.select($"relation_id".as("name")).distinct()
      .rdd.map(_.getString(0)).zipWithUniqueId().map { case (n, i) => (n, i * 2 + 1) }
    val entIdMap = spark.createDataFrame(entVerts).toDF("entity_id", "vid")
    val relIdMap = spark.createDataFrame(relVerts).toDF("relation_id", "vid")

    val edges = er
      .join(entIdMap, "entity_id").withColumnRenamed("vid", "evid")
      .join(relIdMap, "relation_id").withColumnRenamed("vid", "rvid")
      .select($"evid".as[Long], $"rvid".as[Long])
      .rdd.map { case (e, r) => Edge(e, r, ()) }

    val seedEntVids = seedEntityIds.select("entity_id").distinct()
      .join(entIdMap, "entity_id").select($"vid".as[Long]).rdd
    val seedRelVids = seedRelationIds.select("relation_id").distinct()
      .join(relIdMap, "relation_id").select($"vid".as[Long]).rdd
    val seedSet = spark.sparkContext.broadcast(seedEntVids.collect().toSet)
    val seedRelSet = spark.sparkContext.broadcast(seedRelVids.collect().toSet)

    val allVerts = entVerts.map(_._2).union(relVerts.map(_._2)).map(v => (v: VertexId, ()))
    // layer 0 = seed entities AND the init relation set (relations incident to
    // seeds are assigned in superstep 1 via messages; seed relations start at 0).
    val init = Graph(allVerts, edges)
      .mapVertices { (vid, _) =>
        if (seedSet.value.contains(vid) || seedRelSet.value.contains(vid)) 0
        else Int.MaxValue
      }

    // 2*degree supersteps + 1 initial flood from seed entities to their relations.
    val maxIter = 2 * degree + 1
    val result = init.pregel(Int.MaxValue, maxIter, EdgeDirection.Either)(
      vprog = (_, attr, msg) => math.min(attr, msg),
      sendMsg = triplet => {
        val out = Iterator.newBuilder[(VertexId, Int)]
        if (triplet.srcAttr != Int.MaxValue && triplet.dstAttr == Int.MaxValue)
          out += ((triplet.dstId, triplet.srcAttr + 1))
        if (triplet.dstAttr != Int.MaxValue && triplet.srcAttr == Int.MaxValue)
          out += ((triplet.srcId, triplet.dstAttr + 1))
        out.result()
      },
      mergeMsg = math.min)

    val layers = spark.createDataFrame(
      result.vertices.map { case (vid, layer) => (vid, layer) }).toDF("vid", "layer")
      .filter($"layer" =!= Int.MaxValue)

    // Reference semantics: after d rounds the entity set is E0 ∪ ents(R_{d-1})
    // (BFS layer ≤ 2d) and the relation set additionally includes rels of the
    // last new entities (layer ≤ 2d+1).
    val entities = layers.join(entIdMap, "vid")
      .filter($"layer" <= 2 * degree)
      .select("entity_id")
    val relations = layers.join(relIdMap, "vid")
      .filter($"layer" <= 2 * degree + 1)
      .select("relation_id")

    val entList = entities.as[String].collect().sorted.toSeq
    val relList = relations.as[String].collect().sorted.toSeq
    val history = Seq(ExpansionStep(degree, entList, relList,
      entList.size.toLong, relList.size.toLong))
    Subgraph(entities, relations, history)
  }
}
