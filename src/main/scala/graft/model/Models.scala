package graft.model

/** Core data model of the engine — the reference's property-graph-in-three-tables
  * re-expressed as Spark case classes (reference: src/vector_graph_rag/models.py:14-111).
  *
  * Identity is *by normalized text* (models.py:61-67 case-insensitive equality;
  * graph/builder.py:76-112 dedup): we therefore use deterministic ids
  * `md5(normalizedText)` so every build stage is reproducible and oracle-checkable
  * (SURVEY §7.1).
  */

/** (subject, predicate, object); equality is case-insensitive in the reference
  * (models.py:14-42) — we normalize eagerly so plain equality works. */
final case class Triplet(subject: String, predicate: String, obj: String)

/** A graph node for a real-world entity (models.py:45-67). */
final case class Entity(
    id: String,
    name: String,
    relationIds: Seq[String] = Seq.empty,
    passageIds: Seq[String] = Seq.empty,
    embedding: Option[Seq[Float]] = None)

/** An edge: `text` = "subject predicate object" (graph/builder.py:99-103);
  * entityIds is POSITIONAL: [subjectId, objectId] (knowledge_graph.py:76-84). */
final case class Relation(
    id: String,
    text: String,
    subject: String,
    predicate: String,
    obj: String,
    entityIds: Seq[String] = Seq.empty,
    passageIds: Seq[String] = Seq.empty,
    embedding: Option[Seq[Float]] = None)

/** A source text chunk (models.py:93-111). */
final case class Passage(
    id: String,
    text: String,
    entityIds: Seq[String] = Seq.empty,
    relationIds: Seq[String] = Seq.empty,
    embedding: Option[Seq[Float]] = None)

/** An input document: free text plus optional pre-extracted triplets
  * (rag.py:260, graph/builder.py:150-157). */
final case class Doc(
    id: String,
    text: String,
    triplets: Seq[Triplet] = Seq.empty)

/** One retrieval hit (models.py:114-139). */
final case class RetrievalHit(id: String, text: String, score: Double, rank: Int)

/** One expansion step of the subgraph working set (knowledge_graph.py:293-346). */
final case class ExpansionStep(
    degree: Int,
    addedEntityIds: Seq[String],
    addedRelationIds: Seq[String],
    entityCount: Long,
    relationCount: Long)

/** One vertex in a neighborhood listing (api/app.py:697-761). */
final case class NeighborEntity(id: String, name: String)

/** Result of `GraphRag.neighbors`: the entity, its incident relations, and the
  * entities one hop away (api/app.py:697-761; limit quirk graph/graph.py:717). */
final case class NeighborResult(
    entity: Option[NeighborEntity],
    relations: Seq[RetrievalHit],
    neighbors: Seq[NeighborEntity])

/** Result of `GraphRag.query` (models.py:190-229). */
final case class QueryResult(
    question: String,
    answer: String,
    passages: Seq[RetrievalHit],
    relations: Seq[RetrievalHit],
    namedEntities: Seq[String],
    expansionHistory: Seq[ExpansionStep],
    evictionApplied: Boolean)
