package graft.operators

import graft.model.ExpansionStep
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

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

  /** Frontier size up to which both hop sides of a degree run as ONE fused
    * action: re-evaluating the entity-hop subplan inside the relation hop's
    * broadcast (one extra broadcast-semi scan, fully parallel) beats a second
    * sequential driver round-trip. Above it, the duplicated hop is real work
    * and the frontier broadcast itself gets heavy — the two-action path wins
    * (measured at sf0.1: fused wins through ~30k ids, loses at ~120k). */
  val FuseFrontierLimit: Int = 1 << 15

  /** @param fuseSeedInit collect the seed entities and the init-merge relations
    *   in ONE action (the seed subplan — typically a query-time KNN — is
    *   evaluated in both union branches of the same job, which beats two
    *   sequential driver round-trips when seeds are query-sized; leave false
    *   for analytical traversals with large seed sets). */
  def expand(
      seedEntityIds: DataFrame,  // column: entity_id
      seedRelationIds: DataFrame, // column: relation_id
      entityRelation: DataFrame,  // entity_id, relation_id, [role]
      degree: Int,
      maxWorkingSet: Int = DefaultMaxWorkingSet,
      fuseSeedInit: Boolean = false): Subgraph = {

    val spark = entityRelation.sparkSession
    val er = entityRelation.select("entity_id", "relation_id")

    // LocalRelation, NOT parallelize: every downstream use is a broadcast
    // join, and a LocalRelation ships to executors ONCE via the broadcast
    // (torrent) while parallelize embeds the rows in every task binary —
    // a large hop list was producing multi-MB tasks ("TaskSetManager: task
    // of very large size") on each subsequent job.
    def local(ids: Seq[String], name: String): DataFrame = {
      import spark.implicits._
      ids.toDF(name)
    }

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

    // (id, kind) twin of collectBounded for the fused hop.
    def collectBoundedRows(df: DataFrame, what: String): Seq[(String, String)] = {
      val rows = df.limit(maxWorkingSet + 1).collect()
      if (rows.length > maxWorkingSet)
        throw new IllegalStateException(
          s"subgraph expansion: $what exceeded maxWorkingSet=$maxWorkingSet ids; " +
            "the reached set is not driver-bounded — use GraphXExpansion.expand " +
            "(distributed id sets) or raise maxWorkingSet")
      rows.toIndexedSeq.map(r => (r.getString(0), r.getString(1)))
    }

    // Query-time retrieval shape (top-k seeds, degree 1, fused): the WHOLE
    // traversal — seed set, init-merge relations, and both degree-1 hop
    // sides — is one tagged union collected in a SINGLE action. Each later
    // stage appears as a broadcast subplan of the next (the planner
    // broadcasts the tiny distinct sets; the edge table is scanned a few
    // extra times, in parallel, from its materialized form), trading ~6
    // bounded edge scans for two whole driver round-trips. Results are
    // list-identical to the loop below (GraphXExpansionSpec pins it).
    if (fuseSeedInit && degree == 1) {
      val seeds = seedEntityIds.select("entity_id").distinct()
      val initRels = er.join(broadcast(seeds), Seq("entity_id"), "left_semi")
        .select("relation_id")
        .unionByName(seedRelationIds.select("relation_id"))
        .distinct()
      val newEnts = er.join(broadcast(initRels), Seq("relation_id"), "left_semi")
        .select("entity_id").distinct()
        .join(broadcast(seeds), Seq("entity_id"), "left_anti")
      val newRels = er.join(broadcast(newEnts), Seq("entity_id"), "left_semi")
        .select("relation_id").distinct()
        .join(broadcast(initRels), Seq("relation_id"), "left_anti")
      val tagged = Seq(
        seeds.select(col("entity_id").as("id"), lit("e0").as("kind")),
        initRels.select(col("relation_id").as("id"), lit("r0").as("kind")),
        newEnts.select(col("entity_id").as("id"), lit("e1").as("kind")),
        newRels.select(col("relation_id").as("id"), lit("r1").as("kind")))
        .reduce(_ unionByName _)
      // The cap contract matches the two-action path: maxWorkingSet bounds
      // each COLLECT there (seed-init pair, hop pair), so the fused fetch
      // allows 2× and re-checks per pair below — fusing must not silently
      // tighten the working-set contract to the four-set total.
      val rows = {
        val r = tagged.limit(2 * maxWorkingSet + 2).collect()
          .map(x => (x.getString(0), x.getString(1))).toIndexedSeq
        def pair(a: String, b: String, what: String): Unit =
          if (r.count(t => t._2 == a || t._2 == b) > maxWorkingSet)
            throw new IllegalStateException(
              s"subgraph expansion: $what exceeded maxWorkingSet=$maxWorkingSet ids; " +
                "the reached set is not driver-bounded — use GraphXExpansion.expand " +
                "(distributed id sets) or raise maxWorkingSet")
        pair("e0", "r0", "seed entities + init relations")
        pair("e1", "r1", "degree-1 fused hop")
        r
      }
      def of(k: String) = rows.collect { case (id, `k`) => id }.sorted
      val (se, ir, ae, ar) = (of("e0"), of("r0"), of("e1"), of("r1"))
      val allE = se ++ ae
      val allR = ir ++ ar
      return Subgraph(local(allE, "entity_id"), local(allR, "relation_id"),
        Seq(
          ExpansionStep(0, se, ir, se.size.toLong, ir.size.toLong),
          ExpansionStep(1, ae, ar, allE.size.toLong, allR.size.toLong)))
    }

    // P1 seed entities + init-merge (knowledge_graph.py:280-302): relations
    // incident to seed entities ∪ seed relations. Two actions, or one fused
    // (see the parameter doc).
    val (seedEntityList, initRelationList) =
      if (fuseSeedInit) {
        val seeds = seedEntityIds.select("entity_id").distinct()
        val rows = collectBoundedRows(
          seeds.select(col("entity_id").as("id"), lit("e").as("kind"))
            .unionByName(
              er.join(broadcast(seeds), Seq("entity_id"), "left_semi")
                .select("relation_id")
                .unionByName(seedRelationIds.select("relation_id"))
                .distinct()
                .select(col("relation_id").as("id"), lit("r").as("kind"))),
          "seed entities + init relations")
        (rows.collect { case (id, "e") => id }.sorted,
          rows.collect { case (id, "r") => id }.sorted)
      } else {
        val se = collectBounded(
          seedEntityIds.select("entity_id").distinct(), "seed entities")
        val ir = collectBounded(
          er.join(broadcast(local(se, "entity_id")), Seq("entity_id"), "left_semi")
            .select("relation_id")
            .unionByName(seedRelationIds.select("relation_id"))
            .distinct(), "init relations")
        (se, ir)
      }
    var entityList = seedEntityList
    var entitySeen = entityList.toSet
    var entDf = local(entityList, "entity_id")
    var relationList = initRelationList
    var relationSeen = relationList.toSet
    var relDf = local(relationList, "relation_id")
    var frontierList = initRelationList
    var frontierRels = relDf

    val history = Seq.newBuilder[ExpansionStep]
    history += ExpansionStep(0, seedEntityList, initRelationList,
      entityList.size.toLong, relationList.size.toLong)

    // P2/P3/P4 degree loop (knowledge_graph.py:305-346). Small frontiers
    // (query-time retrieval: top-k seeds, degree 1) fuse both hop sides into
    // ONE action: the entity-hop subplan is re-evaluated inside the relation
    // hop's broadcast, which is cheaper than a second driver round-trip when
    // the sets are tiny. Large frontiers (analytical traversals like
    // p4_degree2, where the duplicate entity-hop evaluation is real work)
    // keep the two-action path. The frontier size is known driver-side, so
    // the choice costs nothing and the results are identical.
    for (d <- 1 to degree) {
      val newEntities = er.join(broadcast(frontierRels), Seq("relation_id"), "left_semi")
        .select("entity_id").distinct()
        .join(broadcast(entDf), Seq("entity_id"), "left_anti")
      val (addedE, addedR) =
        if (frontierList.size <= FuseFrontierLimit) {
          val newRelations = er.join(broadcast(newEntities), Seq("entity_id"), "left_semi")
            .select("relation_id").distinct()
            .join(broadcast(relDf), Seq("relation_id"), "left_anti")
          val rows = collectBoundedRows(
            newEntities.select(col("entity_id").as("id"), lit("e").as("kind"))
              .unionByName(newRelations.select(col("relation_id").as("id"), lit("r").as("kind"))),
            s"degree-$d fused hop")
          (rows.collect { case (id, "e") => id }.sorted,
            rows.collect { case (id, "r") => id }.sorted)
        } else {
          val aE = collectBounded(newEntities, s"degree-$d entity hop")
          val newEntDf = local(aE, "entity_id")
          val aR = collectBounded(
            er.join(broadcast(newEntDf), Seq("entity_id"), "left_semi")
              .select("relation_id").distinct()
              .join(broadcast(relDf), Seq("relation_id"), "left_anti"),
            s"degree-$d relation hop")
          (aE, aR)
        }
      entityList = entityList ++ addedE.filterNot(entitySeen)
      relationList = relationList ++ addedR.filterNot(relationSeen)
      entitySeen ++= addedE
      relationSeen ++= addedR
      entDf = local(entityList, "entity_id")
      relDf = local(relationList, "relation_id")
      frontierList = addedR
      frontierRels = local(addedR, "relation_id")
      history += ExpansionStep(d, addedE, addedR,
        entityList.size.toLong, relationList.size.toLong)
    }

    Subgraph(entDf, relDf, history.result())
  }

  /** Distributed-frames variant of [[expand]] for ANALYTICAL traversals whose
    * reached set is corpus-sized rather than top-k-bounded: the id sets stay
    * in checkpointed DataFrames end to end — nothing is collected, nothing is
    * re-broadcast from the driver. Each hop is a semi-join + distinct +
    * anti-join over the edge table; the frontier/seen frames are small
    * relative to the edges, so AQE broadcasts them from their materialized
    * (checkpointed) form without a driver round-trip. Sits between [[expand]]
    * (driver-bounded working sets — query-time retrieval) and
    * [[GraphXExpansion]] (Pregel — deep traversals where per-hop scheduling
    * dominates): same semantics, different working-set contracts.
    *
    * History carries exact cumulative counts; id samples only when
    * `historySampleCap` > 0 (they cost one bounded sort-limit job per frame). */
  def expandFrames(
      seedEntityIds: DataFrame,
      seedRelationIds: DataFrame,
      entityRelation: DataFrame,
      degree: Int,
      historySampleCap: Int = 0): Subgraph = {
    val er = entityRelation.select("entity_id", "relation_id")
    val seedE = seedEntityIds.select("entity_id").distinct().localCheckpoint(true)
    val initR = er.join(seedE, Seq("entity_id"), "left_semi")
      .select("relation_id")
      .unionByName(seedRelationIds.select("relation_id"))
      .distinct().localCheckpoint(true)

    def sample(df: DataFrame, c: String): Seq[String] =
      if (historySampleCap <= 0) Seq.empty
      else df.orderBy(col(c)).limit(historySampleCap)
        .collect().map(_.getString(0)).toSeq

    val history = Seq.newBuilder[ExpansionStep]
    // Seen sets as unions of the per-hop checkpointed frames: the union is
    // re-evaluated lazily from materialized pieces (cheap), never re-derived.
    var entFrames = List(seedE)
    var relFrames = List(initR)
    var entCount = seedE.count() // counts on checkpointed frames are ~free
    var relCount = initR.count()
    history += ExpansionStep(0,
      sample(seedE, "entity_id"), sample(initR, "relation_id"), entCount, relCount)
    var frontier = initR
    // Hop sides deliberately NOT fused into one job here: unlike expand()'s
    // driver path (where re-evaluating the entity hop is a cheap extra
    // broadcast-semi scan), in frames mode the duplicated subplan is a real
    // distinct shuffle — measured slower than the second job's round-trip.
    for (d <- 1 to degree) {
      val entities = entFrames.reduce(_ unionByName _)
      val relations = relFrames.reduce(_ unionByName _)
      val newE = er.join(frontier, Seq("relation_id"), "left_semi")
        .select("entity_id").distinct()
        .join(entities, Seq("entity_id"), "left_anti")
        .localCheckpoint(true)
      val newR = er.join(newE, Seq("entity_id"), "left_semi")
        .select("relation_id").distinct()
        .join(relations, Seq("relation_id"), "left_anti")
        .localCheckpoint(true)
      entFrames ::= newE
      relFrames ::= newR
      entCount += newE.count()
      relCount += newR.count()
      history += ExpansionStep(d,
        sample(newE, "entity_id"), sample(newR, "relation_id"), entCount, relCount)
      frontier = newR
    }
    Subgraph(entFrames.reduce(_ unionByName _), relFrames.reduce(_ unionByName _),
      history.result())
  }

  /** P5 passage collection: distinct passages of all subgraph relations
    * (knowledge_graph.py:348-356) via the edge table. */
  def collectPassages(relationIds: DataFrame, relationPassage: DataFrame): DataFrame =
    relationPassage.join(broadcast(relationIds.select("relation_id")),
        Seq("relation_id"), "left_semi")
      .select("passage_id").distinct()
}
