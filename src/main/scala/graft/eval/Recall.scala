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
  /** Shared preamble of every rank metric: gold sets sized per question,
    * retrieved deduped to best (min) rank, GOLD-DRIVEN left join (questions
    * that retrieved nothing survive with null ranks), hit = gold membership.
    * One definition so recall and nDCG can never silently diverge on the
    * join contract. */
  private def joinedHits(retrieved: DataFrame, gold: DataFrame): DataFrame = {
    val goldSized = gold.groupBy("question_id")
      .agg(collect_set(col("item")).as("gold_set"), countDistinct(col("item")).as("gold_n"))
    val dedupedRetrieved = retrieved.groupBy("question_id", "item")
      .agg(min(col("rank")).as("rank"))
    goldSized.join(dedupedRetrieved, Seq("question_id"), "left")
      .withColumn("hit", array_contains(col("gold_set"), col("item")))
  }

  def recallAtK(retrieved: DataFrame, gold: DataFrame, ks: Seq[Int] = kGrid): DataFrame = {
    val aggs = ks.map(k =>
      (sum(when(col("hit") && col("rank") <= k, 1).otherwise(0)) /
        first(col("gold_n"))).as(s"recall_at_$k"))
    joinedHits(retrieved, gold).groupBy("question_id").agg(aggs.head, aggs.tail: _*)
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

  /** nDCG@k with binary relevance (gold membership), the rank-position-aware
    * companion to Recall@k: DCG = Σ over gold hits at rank r ≤ k of
    * 1/log₂(r+1); IDCG = the same sum over the ideal ranking's first
    * min(|gold|, k) positions (closed form of |gold| — computed per question
    * with an `aggregate` over a bounded `sequence`, no extra join). Same
    * contracts as [[recallAtK]]: gold-driven left join (zero-retrieval
    * questions score 0, not vanish), retrieved deduped to best rank first.
    * Rounded to 6 dp — the comparison precision the oracle uses.
    *
    * Output: (question_id, ndcg_at_<k>...), one row per gold question. */
  /** Mean reciprocal rank at k (Voorhees 1999): 1/rank of the FIRST gold
    * hit within the top k, 0 when none hits — the single-relevant-answer
    * metric (known-item search, QA with one gold passage) where recall@k
    * saturates and nDCG over-structures. max(1/rank) ≡ 1/min(hit rank)
    * (reciprocal is monotone), so the whole metric is one conditional
    * aggregate over the same joined frame as the other metrics; the lone
    * division is reproduced bit-for-bit by any engine (no sums). One row
    * per question with gold (missing questions would silently lift a macro
    * average). */
  def mrrAtK(retrieved: DataFrame, gold: DataFrame, ks: Seq[Int] = kGrid): DataFrame = {
    val aggs = ks.map { k =>
      round(coalesce(
        max(when(col("hit") && col("rank") <= k, lit(1.0) / col("rank"))),
        lit(0.0)), 6).as(s"mrr_at_$k")
    }
    joinedHits(retrieved, gold).groupBy("question_id").agg(aggs.head, aggs.tail: _*)
  }

  def ndcgAtK(retrieved: DataFrame, gold: DataFrame, ks: Seq[Int] = kGrid): DataFrame = {
    def idcg(k: Int) = aggregate(
      sequence(lit(1), least(first(col("gold_n")), lit(k))),
      lit(0.0), (acc, r) => acc + lit(1.0) / log2(r + 1))
    val aggs = ks.map { k =>
      round(
        sum(when(col("hit") && col("rank") <= k, lit(1.0) / log2(col("rank") + 1))
          .otherwise(0.0)) / idcg(k),
        6).as(s"ndcg_at_$k")
    }
    joinedHits(retrieved, gold).groupBy("question_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Cohen's kappa — beyond-chance agreement between two label columns over
    * the same rows (multi-class): κ = (p_o − p_e)/(1 − p_e), p_o = observed
    * agreement, p_e = Σ_c marginal_a(c)·marginal_b(c)/n². The calibration
    * read for any pair of classifiers/gates in the pipeline: a langid
    * heuristic vs ground truth, two quality gates, annotator vs model —
    * raw accuracy flatters imbalanced label sets, κ does not.
    *
    * Scale shape: one pass for (n, agreement), two map-side-combined
    * marginal aggregates (class-count-sized), a class-keyed join for the
    * chance term — no windows, nothing driver-side. Every input to the
    * three float divisions is an exact BIGINT (p_e's numerator is an
    * integer sum of count products), so the result is engine-exact up to
    * the final rounding. κ is NULL when p_e = 1 (both raters constant —
    * agreement beyond chance is undefined).
    *
    * Output: one row (n, n_agree, po, pe, kappa). */
  def cohenKappa(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // Three aggregates read the label pair; an un-pinned frame would re-run
    // the caller's label derivation (for m7, a corpus-scale regex langid)
    // once per consumer — measured 3.0 s → 1.0 s warm at sf0.1. Two label
    // columns materialize once; the result derives from this checkpoint
    // (callers free it with Bridge.unpersistPlanCheckpoints, the engine-wide
    // contract).
    val p = pairs.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .localCheckpoint(true)
    val t = p.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("_a") === col("_b"), 1L)), lit(0L)).as("n_agree"))
    val ma = p.groupBy(col("_a").as("_c")).agg(count(lit(1)).as("_na"))
    val mb = p.groupBy(col("_b").as("_c")).agg(count(lit(1)).as("_nb"))
    val s = ma.join(mb, Seq("_c"))
      .agg(coalesce(sum(col("_na") * col("_nb")), lit(0L)).as("_s"))
    val po = col("n_agree").cast("double") / col("n")
    val pe = col("_s").cast("double") / (col("n").cast("double") * col("n"))
    t.crossJoin(broadcast(s))
      .select(col("n"), col("n_agree"), po.as("po"), pe.as("pe"),
        when(pe === 1.0, lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** ROUGE-N per (candidate, reference) pair — the n-gram-overlap metric
    * summarization/compression pipelines grade with (Lin 2004), and the
    * data-curation read behind it: when a pipeline REWRITES text (markup
    * extraction, span removal, dedup-driven trimming), ROUGE between
    * output and source quantifies how much content survived. Standard
    * CLIPPED counting: each n-gram's contribution is min(count_cand,
    * count_ref), so repeating a gram in the candidate can't inflate
    * precision.
    *
    * Shape: per-side n-gram explode → (id, gram) counts (map-side
    * combined) → one equi-join on (id, gram) → Σ min per id — everything
    * document-sized, never corpus². Precision over candidate grams,
    * recall over reference grams, both NULL when their side has no grams
    * (undefined, not 0); F1 NULL unless both exist and sum > 0.
    *
    * Output: (id, n_cand, n_ref, overlap, precision, recall, f1). */
  def rougeN(df: DataFrame, idCol: String, candCol: String, refCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"rougeN: n must be >= 1, got $n")
    import graft.functions.Norm
    // tokenize behind an EvalBarrier in its OWN projection: shingles()
    // references its input twice inside a transform lambda, and Catalyst
    // would otherwise inline the regex tokenize per shingle index (the
    // sim1 trap — measured here too: 10.1 s → ~1 s at sf0.1)
    val toks = df.select(col(idCol).as("id"),
      Norm.evalOnce(Norm.normTokens(col(candCol))).as("_ct"),
      Norm.evalOnce(Norm.normTokens(col(refCol))).as("_rt"))
    val base = toks.select(col("id"),
      Norm.shingles(col("_ct"), n).as("_cg"),
      Norm.shingles(col("_rt"), n).as("_rg"))
      .localCheckpoint(true) // two explodes + the totals read it
    val cc = base.select(col("id"), explode(col("_cg")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("_nc"))
    val rc = base.select(col("id"), explode(col("_rg")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("_nr"))
    val ov = cc.join(rc, Seq("id", "g"))
      .groupBy("id").agg(sum(least(col("_nc"), col("_nr"))).as("overlap"))
    val p = when(col("n_cand") > 0, col("overlap").cast("double") / col("n_cand"))
    val r = when(col("n_ref") > 0, col("overlap").cast("double") / col("n_ref"))
    base.select(col("id"), size(col("_cg")).cast("long").as("n_cand"),
        size(col("_rg")).cast("long").as("n_ref"))
      .join(ov, Seq("id"), "left")
      .select(col("id"), col("n_cand"), col("n_ref"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .select(col("id"), col("n_cand"), col("n_ref"), col("overlap"),
        p.as("precision"), r.as("recall"),
        when(p + r > 0, lit(2.0) * p * r / (p + r)).as("f1"))
  }

  /** CALIBRATION BINS (the reliability-diagram table): equal-width bins of
    * a [0,1] score vs the empirical positive rate inside each bin — the
    * companion read to [[aucRoc]]: AUC grades the RANKING, calibration
    * grades whether the score is honest as a PROBABILITY, and a quality
    * classifier whose 0.9 bucket is only 60% positive will silently skew
    * any pipeline that thresholds on "p ≥ 0.9" or importance-weights by
    * score. Expected-calibration-error is Σ (n_b/N)·|pos_rate_b − avg_b|
    * over the output rows — left to the caller so the per-bin table stays
    * the artifact (the m6 PR-sweep convention).
    *
    * Shape: ONE map-side-combined aggregate to `bins` rows; n and n_pos
    * are exact BIGINTs, the two ratios are single divisions. Scores
    * outside [0,1) clamp into the edge bins (bin = min(⌊s·bins⌋, bins−1),
    * floored at 0), so a 1.0 score lands in the top bin instead of
    * falling off the table. Rows with a NULL score or label are DROPPED
    * up front — least/greatest skip NULL arguments, so an unguarded NULL
    * score would silently clamp into the TOP bin and pollute its counts.
    *
    * Output: (bin, n, n_pos, avg_score, pos_rate), one row per NON-EMPTY
    * bin. */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"calibrationBins: bins must be >= 1, got $bins")
    val b = greatest(least(floor(col(scoreCol) * bins).cast("long"),
      lit(bins - 1L)), lit(0L))
    scored.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(b.as("bin"), col(scoreCol).as("_s"),
        col(labelCol).cast("long").as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        (sum(col("_s")) / count(lit(1))).as("avg_score"),
        (sum(col("_y")).cast("double") / count(lit(1))).as("pos_rate"))
  }

  /** ROC AUC of a score against a binary label, by the rank-sum identity
    * (Mann-Whitney U): with average ranks r̄_i over ALL rows ordered by
    * score ascending,
    *
    *   AUC = (Σ_{i: y_i=1} r̄_i − P(P+1)/2) / (P·N)
    *
    * — exactly the probability a random positive outranks a random negative,
    * ties counting ½ (which the average-rank form encodes for free). This is
    * the threshold-free companion to the [[graft.operators.CorpusOps]]-style
    * PR sweep (m6): it grades the SCORER, not a cut point, so it's the
    * number to watch while iterating on a quality/langid/dedup classifier
    * before any threshold is chosen.
    *
    * Scale shape: rows collapse to one row PER DISTINCT SCORE first (hash
    * aggregate, map-side combined — for bounded-precision scores like
    * quality ratios this is thousands of rows regardless of corpus size);
    * the single window runs over that collapsed table ordered by score, so
    * the sort is distinct-score-sized, never corpus-sized. The positive
    * rank-sum is exact integer×(k+½) arithmetic until the one final
    * division. AUC is NULL when either class is absent (undefined, not 0).
    *
    * Output: one row (n, n_pos, n_neg, auc). */
  def aucRoc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = scored
      .select(col(scoreCol).as("_s"), col(labelCol).cast("long").as("_y"))
      .groupBy("_s")
      .agg(count(lit(1)).as("_c"), sum(col("_y")).as("_p"))
    // Average rank of every row tied at this score: (#rows below) + (c+1)/2.
    // The window is single-partition BY DESIGN (a cumulative sum needs the
    // total order) and distinct-score-sized; the literal partition key states
    // that intent and keeps WindowExec's unpartitioned-window warning out of
    // production logs.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(0)).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byScore
      .withColumn("_below", sum(col("_c")).over(w) - col("_c"))
      .withColumn("_rbar", col("_below") + (col("_c") + 1).cast("double") / 2)
    ranked.agg(
        sum(col("_c")).as("n"),
        sum(col("_p")).as("n_pos"),
        sum(col("_c") - col("_p")).as("n_neg"),
        sum(col("_p") * col("_rbar")).as("_rsum"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise((col("_rsum") - col("n_pos") * (col("n_pos") + 1).cast("double") / 2) /
            (col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }

  /** Bootstrap confidence interval for the macro average of a per-question
    * metric (Efron's percentile bootstrap): `reps` resamples of n questions
    * WITH replacement, a mean per replicate, the (lo, hi) quantiles of the
    * replicate means. The honesty companion to every macro average this
    * module produces — "recall@5 = 0.81" from 40 eval questions is a point
    * on a wide distribution, and shipping the number without its interval
    * is how eval deltas get over-read.
    *
    * Resampling is HASH-DETERMINISTIC, not RNG-streamed: draw j of
    * replicate r picks question index md5(r ‖ "-" ‖ j) mod n — the same
    * md5-arithmetic convention as the x5 split and g16 walks, so any engine
    * reproduces the exact resample multiset with no seed state, and retries/
    * re-partitionings cannot change the answer.
    *
    * Scale shape: questions are numbered by ONE eval-sized window (this is
    * the per-QUESTION frame — thousands of rows when corpora are 100 TB, it
    * is never corpus data); the draw table is reps × n rows built from a
    * `sequence` explode, resolved to values by one equi-join on the drawn
    * index; replicate means and the final quantiles are two more bounded
    * aggregates. Nothing driver-side except the n needed for the modulus.
    *
    * Output: one row (n_questions, n_reps, mean_r, lo_r, hi_r) — the mean of
    * replicate means and the exact interpolated interval, rounded 6. */
  /** Shared scaffolding of the resampling stats (m9 bootstrap, m12
    * permutation): the per-question frame numbered 0..n−1 by ONE eval-sized
    * window over (id, value) — the value tiebreak pins the numbering even
    * under duplicate ids, so the hash-keyed draws/signs are a pure function
    * of the input multiset — checkpointed (read by the count + the draw
    * join), plus the reps × n index grid from a `sequence` explode. The
    * single-partition window is by design (a global numbering, eval-sized;
    * the literal partition key silences WindowExec's warning). */
  private def numberedRows(perQuestion: DataFrame, idCol: String,
      value: org.apache.spark.sql.Column, caller: String,
      reps: Int): (DataFrame, Long, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val rows = perQuestion
      .select(col(idCol).as("_q"), value.cast("double").as("_v"))
      .withColumn("_rid",
        row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("_q"), col("_v"))) - 1)
      .select("_rid", "_v")
      .localCheckpoint(true)
    val n = rows.count()
    require(n > 0, s"$caller: empty per-question frame")
    val grid = rows.sparkSession.range(reps).toDF("_r")
      .select(col("_r"), explode(sequence(lit(0), lit(n.toInt - 1))).as("_j"))
    (rows, n, grid)
  }

  def bootstrapCi(perQuestion: DataFrame, idCol: String, valueCol: String,
      reps: Int = 200, lo: Double = 0.025, hi: Double = 0.975): DataFrame = {
    require(reps > 0 && lo >= 0 && hi <= 1 && lo < hi)
    val (rows, n, grid) = numberedRows(perQuestion, idCol, col(valueCol),
      "bootstrapCi", reps)
    val draws = grid.select(col("_r"),
      (graft.functions.Hashing.md5Long(concat_ws("-", col("_r"), col("_j"))) % n).as("_rid"))
    val means = draws.join(rows, Seq("_rid")).groupBy("_r").agg(avg(col("_v")).as("_m"))
    means.agg(
        count(lit(1)).as("n_reps"),
        round(avg(col("_m")), 6).as("mean_r"),
        round(percentile(col("_m"), lit(lo)), 6).as("lo_r"),
        round(percentile(col("_m"), lit(hi)), 6).as("hi_r"))
      .select(lit(n).as("n_questions"), col("n_reps"),
        col("mean_r"), col("lo_r"), col("hi_r"))
  }

  /** Paired sign-flip permutation test: is system A actually better than
    * system B, or is the observed per-question difference noise? The
    * companion to [[bootstrapCi]] — a CI says how wide one system's number
    * is; this says whether a DELTA between two systems survives the null
    * hypothesis that each question's sign is a coin flip (Fisher's exact
    * paired randomization test, the standard IR significance check —
    * Smucker, Allan & Carterette, CIKM 2007 recommend exactly this over the
    * t-test for retrieval metrics).
    *
    * Statistic = Σᵢ d_i with d_i = a_i − b_i (≡ the mean, same n every
    * replicate); replicate r flips the sign of d_i iff md5(r ‖ "-" ‖ i) is
    * odd — the m9 hash-deterministic convention, so any engine reproduces
    * the identical permutation set with no RNG state. Two-sided p with
    * add-one smoothing: (1 + #{r : |Σ_r| ≥ |Σ_obs|}) / (reps + 1), so p is
    * never an impossible 0 from a finite sample.
    *
    * Float-exactness: pass INTEGER-scaled metrics (hit counts, not k-normal-
    * ized recalls) and every permuted sum is integer-exact on any engine —
    * the ≥ threshold can then never flip on partition-order float noise
    * (a replicate that happens to flip only zero-valued d_i reproduces
    * Σ_obs EXACTLY, so near-boundary comparisons are the common case here,
    * not the corner case).
    *
    * Scale shape: the m9 shape — per-QUESTION frame numbered by one
    * eval-sized window, a reps × n sign table from a `sequence` explode,
    * one equi-join, two bounded aggregates; nothing driver-side but n.
    *
    * Output: one row (n_questions, n_reps, mean_diff_r, p_value_r). */
  def pairedPermTest(perQuestion: DataFrame, idCol: String, aCol: String,
      bCol: String, reps: Int = 200): DataFrame = {
    require(reps > 0, s"pairedPermTest: reps must be > 0, got $reps")
    val (rows, n, grid) = numberedRows(perQuestion, idCol,
      col(aCol).cast("double") - col(bCol).cast("double"), "pairedPermTest", reps)
    val obs = rows.agg(sum(col("_v")).as("_obs"), avg(col("_v")).as("_mean"))
    val draws = grid.select(col("_r"), col("_j").as("_rid"))
      .withColumn("_sign",
        when(graft.functions.Hashing.md5Long(concat_ws("-", col("_r"), col("_rid")))
          % 2 === 0, 1.0).otherwise(-1.0))
    val sums = draws.join(rows, Seq("_rid"))
      .groupBy("_r").agg(sum(col("_sign") * col("_v")).as("_s"))
    sums.crossJoin(obs)
      .agg(count(lit(1)).as("n_reps"),
        sum(when(abs(col("_s")) >= abs(col("_obs")), 1L).otherwise(0L)).as("_ge"),
        min(col("_mean")).as("_mean")) // constant across rows; min = that value
      .select(lit(n).as("n_questions"), col("n_reps"),
        round(col("_mean"), 6).as("mean_diff_r"),
        round((col("_ge") + lit(1.0)) / (lit(reps) + lit(1.0)), 6).as("p_value_r"))
  }
}
