package graft.operators

import graft.functions.{Embedder, Norm}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The three node tables + edge tables produced by one build (SURVEY §2.4).
  *
  * Node tables carry the reference's denormalized adjacency arrays for API parity
  * (rag.py:318-352); edge tables are the normalized form every join/hop actually
  * uses at scale (SURVEY §1.4: "edge tables for joins, array columns for parity").
  */
final case class GraphTables(
    entities: DataFrame,        // id, name, relation_ids, passage_ids, embedding
    relations: DataFrame,       // id, text, subject, predicate, object, entity_ids, passage_ids, embedding
    passages: DataFrame,        // id, text, entity_ids, relation_ids, embedding
    entityRelation: DataFrame,  // entity_id, relation_id, role (subject|object)
    entityPassage: DataFrame,   // entity_id, passage_id
    relationPassage: DataFrame) // relation_id, passage_id

/** GraphBuilder — the reference's `GraphBuilder._process_documents`
  * (graph/builder.py:136-197) unrolled into one declarative DataFrame DAG:
  * explode → normalize → dedup → join → collect adjacency. All dedup keys are
  * normalized text; ids are md5(key) so the build is deterministic (SURVEY §7.1).
  *
  * Scale notes: every aggregation here is a hash-aggregate on a string key with
  * map-side combine; the two entity-resolution joins (G4) are joins against the
  * *deduped* entity table, which is orders of magnitude smaller than the triplet
  * stream — Catalyst broadcast-hashes it when small, shuffles on the id key when
  * not. Embedding (the expensive step) happens strictly AFTER dedup
  * (graph/builder.py:79-112 → rag.py:292-316 ordering, §4 "dedup-before-embed").
  */
object GraphBuilder {

  /** docs: columns `id` (string), `text` (string),
    * `triplets` array<struct<subject,predicate,obj>> (pre-extracted, G1 input). */
  def build(docs: DataFrame, embedder: Embedder): GraphTables = {
    val spark = docs.sparkSession

    // Passage id: user id as-is (reference keeps caller ids, rag.py:274-277).
    val passages0 = docs.select(col("id").as("passage_id"), col("text"))

    // G1: triplet explode, arity/empty filtering (graph/builder.py:150-157).
    val tripletRows = docs
      .select(col("id").as("passage_id"), explode(col("triplets")).as("t"))
      .select(
        col("passage_id"),
        Norm.normPhrase(col("t.subject")).as("subject"),
        Norm.normPhrase(col("t.predicate")).as("predicate"),
        Norm.normPhrase(col("t.obj")).as("object"))
      .filter(col("subject") =!= "" && col("predicate") =!= "" && col("object") =!= "")
      .withColumn("relation_text",
        concat_ws(" ", col("subject"), col("predicate"), col("object")))
      .withColumn("relation_id", Norm.idOf(col("relation_text")))
      .withColumn("subject_id", Norm.idOf(col("subject")))
      .withColumn("object_id", Norm.idOf(col("object")))
      // This frame fans out to 5+ consumers (node tables, edge tables, adjacency
      // aggregates) and the result tables are written/acted-on separately —
      // materialize once instead of re-running extraction per branch.
      .localCheckpoint(true)

    // G2: entity dedup + id assignment — distinct normalized name.
    val entities0 = tripletRows
      .select(explode(array(col("subject"), col("object"))).as("name"))
      .distinct()
      .select(Norm.idOf(col("name")).as("entity_id"), col("name"))

    // G3: relation dedup on full normalized text.
    val relations0 = tripletRows
      .select(col("relation_id"), col("relation_text"),
        col("subject"), col("predicate"), col("object"),
        col("subject_id"), col("object_id"))
      .dropDuplicates("relation_id")

    // Edge tables (normalized adjacency).
    val entityRelation = tripletRows
      .select(col("relation_id"),
        explode(array(
          struct(col("subject_id").as("entity_id"), lit("subject").as("role")),
          struct(col("object_id").as("entity_id"), lit("object").as("role")))).as("e"))
      .select(col("e.entity_id"), col("relation_id"), col("e.role"))
      .distinct()

    val entityPassage = tripletRows
      .select(col("passage_id"),
        explode(array(col("subject_id"), col("object_id"))).as("entity_id"))
      .distinct()

    val relationPassage = tripletRows
      .select(col("relation_id"), col("passage_id"))
      .distinct()

    // G4–G6: adjacency arrays (collect_set + sort for determinism).
    val entityRelIds = entityRelation.groupBy("entity_id")
      .agg(sort_array(collect_set(col("relation_id"))).as("relation_ids"))
    val entityPassIds = entityPassage.groupBy("entity_id")
      .agg(sort_array(collect_set(col("passage_id"))).as("passage_ids"))
    val relationPassIds = relationPassage.groupBy("relation_id")
      .agg(sort_array(collect_set(col("passage_id"))).as("passage_ids"))
    val passageEntIds = entityPassage.groupBy("passage_id")
      .agg(sort_array(collect_set(col("entity_id"))).as("entity_ids"))
    val passageRelIds = relationPassage.groupBy("passage_id")
      .agg(sort_array(collect_set(col("relation_id"))).as("relation_ids"))

    val emptyArr = array().cast("array<string>")

    // E1 after dedup: embed each unique entity/relation/passage once, through the
    // embedder's corpus-scale path (embedInto), not the scalar expression.
    val entities = embedder.embedInto(
      entities0
        .join(entityRelIds, Seq("entity_id"), "left")
        .join(entityPassIds, Seq("entity_id"), "left")
        .select(
          col("entity_id").as("id"), col("name"),
          coalesce(col("relation_ids"), emptyArr).as("relation_ids"),
          coalesce(col("passage_ids"), emptyArr).as("passage_ids")),
      "name", "embedding")

    val relations = embedder.embedInto(
      relations0
        .join(relationPassIds, Seq("relation_id"), "left")
        .select(
          col("relation_id").as("id"), col("relation_text").as("text"),
          col("subject"), col("predicate"), col("object"),
          // POSITIONAL [subject_id, object_id] (knowledge_graph.py:76-84)
          array(col("subject_id"), col("object_id")).as("entity_ids"),
          coalesce(col("passage_ids"), emptyArr).as("passage_ids")),
      "text", "embedding")

    val passages = embedder.embedInto(
      passages0
        .join(passageEntIds, Seq("passage_id"), "left")
        .join(passageRelIds, Seq("passage_id"), "left")
        .select(
          col("passage_id").as("id"), col("text"),
          coalesce(col("entity_ids"), emptyArr).as("entity_ids"),
          coalesce(col("relation_ids"), emptyArr).as("relation_ids")),
      "text", "embedding")

    GraphTables(entities, relations, passages, entityRelation, entityPassage, relationPassage)
  }
}
