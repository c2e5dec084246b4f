package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk audits — k-anonymity (Sweeney 2002) and
  * l-diversity (Machanavalli et al. 2007) over quasi-identifier columns:
  * the governance gate a training-data pipeline runs beside PII MASKING
  * (x7 masks direct identifiers; these quantify what the remaining
  * quasi-identifiers still leak). A release is k-anonymous when every
  * quasi-identifier combination is shared by ≥ k rows, and l-diverse when
  * every such equivalence class carries ≥ l distinct sensitive values —
  * the two standard pre-release checks for tabular/metadata sidecars of a
  * training corpus.
  *
  * Both audits are two hash aggregations (rows → equivalence classes →
  * histogram), fully map-side-combined, all-integer output — no pair scan,
  * no collect, O(distinct class sizes) report rows. At 100 TB the first
  * groupBy is the same shuffle any dedup does; skewed quasi-identifier
  * combinations are single hot GROUPS (one row out), not hot joins, so no
  * salting is needed.
  *
  * The reports are HISTOGRAMS, not just the min: the shape (how many rows
  * sit in classes of size 1, 2, …) is what decides whether to generalize,
  * suppress, or drop — a bare k tells you only that one cell is bad. */
object Privacy {

  /** Equivalence-class-size histogram over the quasi-identifier columns:
    * (class_size, n_classes, n_rows) — `k` = the smallest class_size row;
    * rows in class_size 1 are unique records (directly re-identifiable).
    * Null quasi-identifier values form their own classes (SQL GROUP BY
    * semantics — a null ZIP is still a linkable value in a release). */
  def kAnonymityHistogram(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityHistogram: empty quasi-identifier list")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_sz"))
      .groupBy(col("_sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_rows"))
  }

  /** Generalization-ladder diagnostics — the DECISION TABLE for k-anonymity
    * enforcement: for each proposed generalization level (a list of
    * (name, expression) quasi-identifier columns, typically coarsening step
    * by step: raw value → bucket → suppressed), one summary row with the
    * minimum equivalence-class size, class count, and unique-row count.
    * The caller releases at the FIRST level whose min_class_size ≥ k —
    * returning the whole ladder (rather than just the pick) shows the
    * utility cost of each step, which is what decides generalize vs
    * suppress vs drop.
    *
    * One hash-aggregation pair per level — L levels = L bounded passes, a
    * driver loop over frames (never rows); each pass is the same shuffle
    * shape as [[kAnonymityHistogram]]. */
  def generalizationLadder(df: DataFrame,
      levels: Seq[(String, Seq[(String, org.apache.spark.sql.Column)])]): DataFrame = {
    require(levels.nonEmpty, "generalizationLadder: empty ladder")
    levels.zipWithIndex.map { case ((label, quasi), idx) =>
      require(quasi.nonEmpty, s"generalizationLadder: level '$label' has no columns")
      df.groupBy(quasi.map { case (n, c) => c.as(n) }: _*)
        .agg(count(lit(1)).as("_sz"))
        .agg(min(col("_sz")).as("min_class_size"),
          count(lit(1)).as("n_classes"),
          sum(when(col("_sz") === 1, 1L).otherwise(0L)).as("n_unique_rows"))
        .select(lit(idx.toLong).as("level"), lit(label).as("level_name"),
          col("min_class_size"), col("n_classes"), col("n_unique_rows"))
    }.reduce(_ unionByName _)
  }

  /** Distinct-sensitive-value histogram per equivalence class:
    * (l_distinct, n_classes) — `l` = the smallest l_distinct row; classes
    * with l_distinct 1 leak their sensitive attribute outright (everyone
    * in the class shares it). */
  def lDiversityHistogram(df: DataFrame, quasiCols: Seq[String],
                          sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityHistogram: empty quasi-identifier list")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count_distinct(col(sensitiveCol)).as("_l"))
      .groupBy(col("_l").as("l_distinct"))
      .agg(count(lit(1)).as("n_classes"))
  }

  /** Randomized response (Warner 1965 / the RAPPOR one-bit core) — LOCAL
    * differential privacy for a per-subject boolean: each subject's bit is
    * flipped with probability num/den BEFORE aggregation, so the collector
    * never holds a truthful row, yet the population count debiases exactly:
    *   E[obs] = (1-p)·t + p·(n-t)  ⇒  t̂ = (obs - p·n)/(1 - 2p).
    * Privacy: ε = ln((1-p)/p) (p=1/4 ⇒ ε = ln 3).
    *
    * The flip draw is the house oracle-replicable hash
    * ([[graft.functions.Hashing.md5Long]] of salt‖id, mod den) — a
    * deterministic mechanism is NOT private in production (an adversary
    * replays the hash; swap in a real RNG there), but it is what lets the
    * SQL twin replay the mechanism bit-for-bit, which is the property the
    * board row pins. The debiased estimate ships as an EXACT BIGINT
    * rational: est = (den·obs − num·n) / (den − 2·num) — zero float
    * surface. One aggregation pass, map-side combined; the true count
    * rides along because the pre-randomization frame is in hand anyway
    * (it is what the estimate is validated against).
    *
    * Returns one row: (n, observed, est_num, est_den, true_cnt). */
  def randomizedResponse(df: DataFrame, idCol: String, bitCol: String,
                         flipNum: Int = 1, flipDen: Int = 4,
                         salt: String = "rr"): DataFrame = {
    require(flipNum >= 1 && flipDen > 2 * flipNum,
      s"flip probability num/den must be in (0, 1/2), got $flipNum/$flipDen")
    val flip = graft.functions.Hashing.md5Long(
      concat(lit(salt + "|"), col(idCol).cast("string"))) % flipDen < flipNum
    val reported = when(flip, lit(1L) - col(bitCol).cast("long"))
      .otherwise(col(bitCol).cast("long"))
    df.agg(count(lit(1)).as("n"),
        sum(reported).as("observed"),
        sum(col(bitCol).cast("long")).as("true_cnt"))
      .select(col("n"), col("observed"),
        (lit(flipDen.toLong) * col("observed") - lit(flipNum.toLong) * col("n"))
          .as("est_num"),
        lit((flipDen - 2L * flipNum)).as("est_den"),
        col("true_cnt"))
  }
}
