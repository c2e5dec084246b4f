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
  * The per-degree audit log (knowledge_graph.py:293-346 parity) is DERIVED from
  * the final vertex layers — degree d adds entities with layer ∈ (2d−2, 2d] and
  * relations with layer ∈ (2d−1, 2d+1] (layer ≤ 1 for the init relation set) —
  * so one Pregel run yields the full step-by-step history. Because this variant
  * exists for traversals whose reached set is NOT bounded by top-k × degree,
  * the history carries exact counts but only id samples capped at
  * `historySampleCap`; the full id sets stay distributed in the returned
  * [[Subgraph]] frames.
  */
object GraphXExpansion {

  def expand(
      seedEntityIds: DataFrame,
      seedRelationIds: DataFrame,
      entityRelation: DataFrame,
      degree: Int,
      historySampleCap: Int = 100): Subgraph = {
    // Bounded-aggregate cap: TopKAggregator preallocates O(cap) buffer slots
    // per aggregation task AND the per-step samples are collected to the
    // driver, so the ceiling must be genuinely small — these are audit
    // SAMPLES, not result sets (the full id sets stay distributed in the
    // returned frames). 10k ids ≈ a few hundred KB per step, task- and
    // driver-safe even with many steps.
    val sampleCap = math.min(math.max(historySampleCap, 0), 10000)
    val spark = entityRelation.sparkSession
    import spark.implicits._

    val er = entityRelation.select("entity_id", "relation_id").distinct()

    // Stable string->long vertex ids (entities even, relations odd). Seed ids
    // are unioned in so isolated seeds (no incident edges) keep their vertex —
    // the loop implementation retains them in the entity set.
    val entVerts = er.select($"entity_id".as("name"))
      .union(seedEntityIds.select($"entity_id".as("name"))).distinct()
      .rdd.map(_.getString(0)).zipWithUniqueId().map { case (n, i) => (n, i * 2) }
    val relVerts = er.select($"relation_id".as("name"))
      .union(seedRelationIds.select($"relation_id".as("name"))).distinct()
      .rdd.map(_.getString(0)).zipWithUniqueId().map { case (n, i) => (n, i * 2 + 1) }
    val entIdMap = spark.createDataFrame(entVerts).toDF("entity_id", "vid")
    val relIdMap = spark.createDataFrame(relVerts).toDF("relation_id", "vid")

    val edges = er
      .join(entIdMap, "entity_id").withColumnRenamed("vid", "evid")
      .join(relIdMap, "relation_id").withColumnRenamed("vid", "rvid")
      .select($"evid".as[Long], $"rvid".as[Long])
      .rdd.map { case (e, r) => Edge(e, r, ()) }

    // Seed sets are query-sized (top-k hits) — broadcasting them is the point.
    val seedSet = spark.sparkContext.broadcast(
      seedEntityIds.select("entity_id").distinct()
        .join(entIdMap, "entity_id").select($"vid".as[Long]).rdd.collect().toSet)
    val seedRelSet = spark.sparkContext.broadcast(
      seedRelationIds.select("relation_id").distinct()
        .join(relIdMap, "relation_id").select($"vid".as[Long]).rdd.collect().toSet)

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
      .localCheckpoint(true) // feeds the result frames AND the history aggregate

    // Reference semantics: after d rounds the entity set is E0 ∪ ents(R_{d-1})
    // (BFS layer ≤ 2d) and the relation set additionally includes rels of the
    // last new entities (layer ≤ 2d+1).
    val entities = layers.join(entIdMap, "vid")
      .filter($"layer" <= 2 * degree)
      .select("entity_id")
    val relations = layers.join(relIdMap, "vid")
      .filter($"layer" <= 2 * degree + 1)
      .select("relation_id")

    // Per-degree audit from the layer histogram: exact counts + capped samples,
    // all in ONE aggregation job (no full-result collect). The sample is a
    // bounded min-k aggregate ([[TopKAggregator]] with a constant score ranks
    // by id ascending): map-side partials keep every task's contribution ≤ cap,
    // instead of funneling the whole reached set through a per-step window sort.
    val entSteps = layers.join(entIdMap, "vid")
      .filter($"layer" <= 2 * degree)
      .select($"entity_id".as("id"), lit("e").as("kind"),
        ceil($"layer" / 2.0).cast("int").as("step"))
    val relSteps = layers.join(relIdMap, "vid")
      .filter($"layer" <= 2 * degree + 1)
      .select($"relation_id".as("id"), lit("r").as("kind"),
        when($"layer" <= 1, 0)
          .otherwise(ceil(($"layer" - 1) / 2.0).cast("int")).as("step"))
    val minK = udaf(new TopKAggregator(sampleCap))
    val perStep = entSteps.unionByName(relSteps)
      .groupBy("kind", "step")
      .agg(count(lit(1)).as("n"), minK($"id", lit(0.0)).as("sample"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getSeq[org.apache.spark.sql.Row](3).map(_.getString(0)).toSeq))
      .toMap

    var entTotal = 0L
    var relTotal = 0L
    val history = (0 to degree).map { d =>
      val (ne, se) = perStep.getOrElse(("e", d), (0L, Seq.empty[String]))
      val (nr, sr) = perStep.getOrElse(("r", d), (0L, Seq.empty[String]))
      entTotal += ne
      relTotal += nr
      ExpansionStep(d, se, sr, entTotal, relTotal)
    }
    Subgraph(entities, relations, history)
  }
}
