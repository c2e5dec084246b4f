package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over token arrays — the distributed form of the
  * fastText/cld-style linear text classifier a training-data pipeline runs
  * for language-ID and quality gating at corpus scale (extension beside the
  * x1/x2 heuristics; the reference ships no trained classifier — its
  * language/quality signals are rule-based).
  *
  * Scale shape: training is ONE map-side-combinable count aggregation over
  * exploded (label, token) rows — shuffle width is the (label × vocab)
  * model, never the corpus. Prediction joins test-token rows against the
  * model on (label, token): an equi-join Catalyst shuffles on the model key,
  * with the per-label totals/priors (nLabels rows) broadcast. No all-pairs,
  * no driver loop; the only driver scalars are vocab size and the training
  * doc count (two bounded longs).
  *
  * Cross-engine determinism: scores are products of Laplace-smoothed term
  * probabilities — each term one exact IEEE division of integer-derived
  * doubles, folded IN TOKEN-POSITION ORDER (sort_array + left fold here,
  * `product(term ORDER BY pos)` in the SQL twin; FP multiplication is
  * exactly rounded but not associative, so both engines fold left in the
  * same order and the doubles match bit-for-bit). No transcendentals: the
  * usual log-space sum would tie the result to each engine's libm, so the
  * score stays in product space and `maxTokens` caps the factor count to
  * keep it far above the double underflow floor (40 terms ≥ 1e-5 each
  * → ≥ 1e-200 ≫ 2.2e-308; a 40-token prefix decides language identity as
  * well as the full document in practice).
  */
object NaiveBayes {

  /** The trained model as one integer-exact frame:
    * (label, token, cnt, label_tokens, vocab) — per-(label, token)
    * occurrence count, per-label token total, and corpus vocabulary size.
    * Everything downstream (smoothed probabilities, scores) derives from
    * these counts, so the model itself is hash-stable across engines. */
  def model(train: DataFrame, labelCol: String, toksCol: String): DataFrame = {
    val (counts, totals, vocab) = modelParts(train, labelCol, toksCol)
    counts.join(broadcast(totals.withColumnRenamed("tot", "label_tokens")),
        Seq("label"))
      .withColumn("vocab", lit(vocab))
  }

  /** The shared training aggregations — ONE implementation feeding both
    * [[model]] and [[predict]] so a smoothing/counting change can never
    * silently diverge between them (r15 review catch): per-(label, token)
    * counts, per-label token totals ("tot"), and the vocab-size scalar
    * (the one driver action here). */
  private def modelParts(train: DataFrame, labelCol: String,
      toksCol: String): (DataFrame, DataFrame, Long) = {
    val toks = train.select(col(labelCol).as("label"),
      explode(col(toksCol)).as("token"))
    val counts = toks.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val totals = toks.groupBy("label").agg(count(lit(1)).as("tot"))
    val vocab = toks.agg(countDistinct(col("token"))).head().getLong(0)
    (counts, totals, vocab)
  }

  /** Classify `test` docs: returns (id, pred) with `pred` the label whose
    * prior × Π smoothed-term-probability product is maximal (ties broken by
    * label ascending). Docs whose token array is empty (or all tokens
    * sliced off) fall back to the prior-only score instead of dropping out.
    */
  def predict(train: DataFrame, test: DataFrame, labelCol: String,
              toksCol: String, idCol: String, maxTokens: Int = 40): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 200,
      s"maxTokens must be in [1, 200] (double-underflow guard), got $maxTokens")
    val (counts, totals, vocab) = modelParts(train, labelCol, toksCol)
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("dc"))
    val dTot = train.count()

    val testToks = test.select(col(idCol).as("id"),
      posexplode(slice(col(toksCol), 1, maxTokens)).as(Seq("pos", "token")))
    // one row per (test token, candidate label); totals is nLabels rows
    val grid = testToks.crossJoin(broadcast(totals))
    val terms = grid.join(counts, Seq("label", "token"), "left")
      .withColumn("term",
        (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("tot") + lit(vocab)).cast("double"))
    val prods = terms.groupBy("id", "label").agg(
      aggregate(sort_array(collect_list(struct(col("pos"), col("term")))),
        lit(1.0d), (acc, s) => acc * s.getField("term")).as("prod"))

    // full id × label grid so token-less docs score by prior alone
    val scored = test.select(col(idCol).as("id"))
      .crossJoin(broadcast(priors))
      .join(prods, Seq("id", "label"), "left")
      .withColumn("score", coalesce(col("prod"), lit(1.0d)) *
        (col("dc").cast("double") / lit(dTot).cast("double")))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("label").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("label").as("pred"))
  }
}
