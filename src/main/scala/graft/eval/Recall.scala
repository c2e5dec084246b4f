package graft.eval

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Evaluation operators (SURVEY §2.9, evaluation/evaluate.py:177-230).
  *
  * M1 Recall@k = |retrieved[:k] ∩ gold| / |gold| per question; M2 gold-set
  * extraction from supporting facts; M3 macro-average over questions. All three
  * are plain aggregations — they run distributed over arbitrarily many questions.
  */
object Recall {

  val kGrid: Seq[Int] = Seq(1, 2, 5, 10, 15, 20)

  /** retrieved: (question_id, rank, item); gold: (question_id, item).
    * → (question_id, recall_at_<k>...) one row per question (M1).
    *
    * Driven from the GOLD side (left join): a question that retrieved nothing
    * contributes recall 0 instead of vanishing from the macro average —
    * evaluate.py averages over all questions.
    *
    * Retrieved items are deduplicated per question keeping their best (min)
    * rank before the hit aggregation — the reference computes
    * |set(retrieved[:k]) ∩ gold| / |gold| (evaluate.py:177-197), so a gold item
    * retrieved at two ranks ≤ k must count once, never twice. */
  def recallAtK(retrieved: DataFrame, gold: DataFrame, ks: Seq[Int] = kGrid): DataFrame = {
    val goldSized = gold.groupBy("question_id")
      .agg(collect_set(col("item")).as("gold_set"), countDistinct(col("item")).as("gold_n"))
    val dedupedRetrieved = retrieved.groupBy("question_id", "item")
      .agg(min(col("rank")).as("rank"))
    val joined = goldSized.join(dedupedRetrieved, Seq("question_id"), "left")
      .withColumn("hit", array_contains(col("gold_set"), col("item")))
    val aggs = ks.map(k =>
      (sum(when(col("hit") && col("rank") <= k, 1).otherwise(0)) /
        first(col("gold_n"))).as(s"recall_at_$k"))
    joined.groupBy("question_id").agg(aggs.head, aggs.tail: _*)
  }

  /** M2 gold titles from supporting facts: `supporting_facts[*][0]`
    * (evaluate.py:200-216). Input: (question_id, supporting_facts ARRAY<ARRAY<STRING>>). */
  def goldTitles(questions: DataFrame): DataFrame =
    questions.select(col("question_id"), explode(col("supporting_facts")).as("sf"))
      .select(col("question_id"), col("sf").getItem(0).as("item"))
      .distinct()

  /** M3 macro average over questions (evaluate.py:435-534). */
  def macroAverage(perQuestion: DataFrame, ks: Seq[Int] = kGrid): DataFrame = {
    val aggs = ks.map(k => round(avg(col(s"recall_at_$k")), 6).as(s"avg_recall_at_$k"))
    perQuestion.agg(aggs.head, aggs.tail: _*)
  }
}
