package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry preference strengths from pairwise win counts — the
  * aggregate-and-rank step of an RLHF/preference-data pipeline (turn raw
  * A-beats-B comparison logs into a per-item strength scale). Extension op:
  * the reference has no preference modeling; this is the standard MM
  * (minorization–maximization) iteration of Hunter 2004, "MM algorithms for
  * generalized Bradley–Terry models" (public).
  *
  * Update (fixed `iters` rounds from p=1):
  *   p_i ← W_i / Σ_j n_ij / (p_i + p_j)
  * with W_i = total wins of i and n_ij = comparisons between i and j. The
  * usual per-round rescaling is intentionally omitted: the MM update is
  * scale-covariant (scaling p by c scales p' by c), so a fixed iteration
  * count yields the same RANKING with or without it, and omitting it keeps
  * the twin SQL one CTE per round with zero whole-frame scalar folds.
  *
  * Scale shape: state is one row per item and the join graph is
  * (pairs ⋈ p) twice per round — shuffles on item keys only, comparisons
  * stay aggregated as n_ij (the raw comparison log is reduced ONCE up
  * front). Driver holds nothing; rounds are DataFrame-to-DataFrame with a
  * localCheckpoint per round to cut lineage. Cross-engine determinism: the
  * Σ_j fold is ordered by j (sort_array left fold here, `sum(x ORDER BY j)`
  * in the SQL twin — both left folds), every term an exact IEEE division,
  * so strengths match bit-for-bit at any fixed round count.
  */
object Preference {

  /** `wins`: one row per ordered (winner, loser) with its comparison count.
    * Returns (item, w, strength): total wins and the BT strength after
    * `iters` MM rounds. Items appearing only as losers keep strength 0 from
    * round 1 on (W=0), matching the MM fixed point for never-winners. */
  def bradleyTerry(wins: DataFrame, winnerCol: String, loserCol: String,
                   nCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    val w = wins.groupBy(col(winnerCol).as("item")).agg(sum(col(nCol)).as("w"))
    val pairs = wins.select(col(winnerCol).as("i"), col(loserCol).as("j"),
        col(nCol).as("n"))
      .unionByName(wins.select(col(loserCol).as("i"), col(winnerCol).as("j"),
        col(nCol).as("n")))
      .groupBy("i", "j").agg(sum(col("n")).as("nij"))
      .localCheckpoint(true)
    var p = pairs.select(col("i").as("item")).distinct()
      .join(w, Seq("item"), "left")
      .withColumn("w", coalesce(col("w"), lit(0L)))
      .withColumn("p", lit(1.0d))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val s = pairs
        .join(p.select(col("item").as("i"), col("p").as("pi")), Seq("i"))
        .join(p.select(col("item").as("j"), col("p").as("pj")), Seq("j"))
        .withColumn("term", col("nij").cast("double") / (col("pi") + col("pj")))
        .groupBy(col("i").as("item")).agg(
          aggregate(sort_array(collect_list(struct(col("j"), col("term")))),
            lit(0.0d), (acc, st) => acc + st.getField("term")).as("s"))
      p = p.drop("p").join(s, Seq("item"))
        .withColumn("p", col("w").cast("double") / col("s"))
        .select("item", "w", "p")
        .localCheckpoint(true)
    }
    p.select(col("item"), col("w"), col("p").as("strength"))
  }
}
