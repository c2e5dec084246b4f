package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** V1 eviction + V3–V5 final assembly (SURVEY §2.8). */
object Assembly {

  /** V1 eviction top-k (retriever.py:232-285): if the candidate count exceeds
    * `threshold`, keep top-`threshold` by similarity to the query vector; ELSE
    * return all sorted lexicographically by id — the HippoRAG-compat quirk: the
    * no-eviction path is id-sorted, NOT score-sorted (retriever.py:263-265).
    *
    * Input `candidates`: (id, embedding); output: (id, rank) in the final order,
    * plus `evicted` flag for the caller.
    */
  def evictionTopK(
      candidates: DataFrame,
      queryVec: Seq[Double],
      threshold: Int): (DataFrame, Boolean) = {
    val n = candidates.count()
    val spark = candidates.sparkSession
    if (n > threshold) {
      val qv = typedLit(queryVec)
      val scored = candidates.select(col("id"),
        VectorFunctions.dot(col("embedding"), qv).as("score"))
      val w = Window.orderBy(col("score").desc, col("id").asc)
      (scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= threshold)
        .select("id", "rank"), true)
    } else {
      val w = Window.orderBy(col("id").asc)
      (candidates.select(col("id")).withColumn("rank", row_number().over(w)), false)
    }
  }

  /** V4 relation→passage join (rag.py:161-194): relations in rerank order →
    * explode passage ids positionally → dedup passages keeping FIRST-SEEN order
    * (by relation rank, then position) → head `topK`.
    *
    * `rankedRelations`: (relation_id, rel_rank); `relations`: full table with
    * `passage_ids` array. Output: (passage_id, rank).
    */
  def passagesForRelations(
      rankedRelations: DataFrame,
      relations: DataFrame,
      topK: Int): DataFrame = {
    val exploded = rankedRelations
      .join(relations.select(col("id").as("relation_id"), col("passage_ids")),
        Seq("relation_id"))
      .select(col("rel_rank"), posexplode(col("passage_ids")))
      .select(col("rel_rank"), col("pos"), col("col").as("passage_id"))
    val firstSeen = Window.partitionBy(col("passage_id"))
      .orderBy(col("rel_rank").asc, col("pos").asc)
    val ordered = Window.orderBy(col("rel_rank").asc, col("pos").asc, col("passage_id").asc)
    exploded
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .withColumn("rank", row_number().over(ordered))
      .filter(col("rank") <= topK)
      .select("passage_id", "rank")
  }

  /** V5 naive-RAG backfill (rag.py:629-638): append KNN passages not already
    * present until `topK` total, preserving order. Inputs: (passage_id, rank). */
  def backfill(graphHits: DataFrame, naiveHits: DataFrame, topK: Int): DataFrame = {
    val extra = naiveHits
      .join(graphHits.select("passage_id"), Seq("passage_id"), "left_anti")
      .withColumn("rank", col("rank") + lit(1000000))
    val w = Window.orderBy(col("rank").asc, col("passage_id").asc)
    graphHits.unionByName(extra)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
