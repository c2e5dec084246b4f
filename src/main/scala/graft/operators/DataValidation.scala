package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ / Great-Expectations
  * stage of a production pipeline (Schelter et al., "Automating Large-Scale
  * Data Quality Verification", VLDB 2018 — Deequ is itself a Spark
  * library, so this family re-expresses the same idea directly on the
  * Dataset API): a constraint list evaluated against a table, producing a
  * per-constraint violation report the pipeline gates on before training
  * data ships. The reference has no validation stage; §2.11 inventory.
  *
  * Scale shape — the part Deequ gets right and a naive implementation
  * gets fatally wrong: row-local constraints (null / range / regex /
  * set-membership) and per-column-set uniqueness all fold into ONE
  * aggregation pass over the table (conditional `sum(when(...))` columns +
  * `count_distinct` columns in a single agg; 20 constraints = 20 columns,
  * not 20 scans), then unpivot the single result row into report rows.
  * Referential-integrity constraints each need their OWN anti-join against
  * the referenced table (an equi-join — broadcast when the reference side
  * is dimension-sized, shuffled hash otherwise; AQE decides), and the
  * report unions those counts in. Nothing is collected; the report is
  * O(#constraints) rows.
  *
  * Violation semantics (each check counts only its OWN failure mode, so
  * reports decompose cleanly):
  *  - NotNull: rows where the column IS NULL.
  *  - InRange/Matches/InSet: NON-NULL rows failing the predicate (nulls
  *    are NotNull's job).
  *  - Unique: surplus rows — n_rows − count(distinct key tuple); 0 means
  *    the key is unique.
  *  - RefIntegrity: NON-NULL rows with no match in the referenced column.
  *
  * Output: (check_name, violations, n_rows, violation_ppm) — counts and an
  * exact integer parts-per-million ratio (no float fold; the report hashes
  * identically on any engine). */
object DataValidation {

  sealed trait Check { def name: String }
  /** Column must not be null. */
  case class NotNull(name: String, column: String) extends Check
  /** Non-null values must satisfy lo <= x <= hi (inclusive). */
  case class InRange(name: String, column: String, lo: Double, hi: Double)
    extends Check
  /** Non-null values must contain a match of the regex (anchor with ^…$
    * for a full match). */
  case class Matches(name: String, column: String, regex: String) extends Check
  /** Non-null values must be one of `values`. */
  case class InSet(name: String, column: String, values: Seq[String])
    extends Check
  /** The column tuple must be unique across rows. */
  case class Unique(name: String, columns: Seq[String]) extends Check
  /** Non-null values must exist in `refCol` of `ref` (foreign key). */
  case class RefIntegrity(name: String, column: String, ref: DataFrame,
                          refCol: String) extends Check

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report: empty check list")
    require(checks.map(_.name).distinct.size == checks.size,
      "report: duplicate check names")
    val rowLocal: Seq[(String, Column)] = checks.collect {
      case NotNull(n, c) => n -> sum(when(col(c).isNull, 1L).otherwise(0L))
      case InRange(n, c, lo, hi) => n -> sum(when(col(c).isNotNull &&
        (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
      case Matches(n, c, re) => n -> sum(when(col(c).isNotNull &&
        !col(c).rlike(re), 1L).otherwise(0L))
      case InSet(n, c, vs) => n -> sum(when(col(c).isNotNull &&
        !col(c).isInCollection(vs), 1L).otherwise(0L))
    }
    val uniques: Seq[(String, Column)] = checks.collect {
      case Unique(n, cs) =>
        n -> (count(lit(1)) - count_distinct(struct(cs.map(col): _*)))
    }
    // ONE aggregation pass for everything row-local + uniqueness…
    val aggCols = (rowLocal ++ uniques).map { case (n, c) => c.as(s"v_$n") } :+
      count(lit(1)).as("__n")
    // ONE row; pinned so the FK branches below read n_rows without
    // re-running the corpus scan per constraint.
    val one = df.agg(aggCols.head, aggCols.tail: _*).localCheckpoint(true)
    val localChecks = rowLocal ++ uniques
    // explode(array()) has element type NULL and the struct-field reads
    // below fail analysis — an all-FK check list skips the unpivot entirely.
    val localReport =
      if (localChecks.isEmpty)
        one.select(lit("").as("check_name"), lit(0L).as("violations"),
          col("__n").as("n_rows")).limit(0)
      else one.select(explode(array(
          localChecks.map { case (n, _) =>
            struct(lit(n).as("check_name"), col(s"v_$n").as("violations"))
          }: _*)).as("r"), col("__n").as("n_rows"))
        .select(col("r.check_name"), col("r.violations"), col("n_rows"))
    // …then one anti-join per foreign-key constraint.
    val fkReports: Seq[DataFrame] = checks.collect {
      case RefIntegrity(n, c, ref, rc) =>
        val missing = df.select(col(c)).filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
        one.select(col("__n").as("n_rows")).crossJoin(missing)
          .select(lit(n).as("check_name"), col("violations"), col("n_rows"))
    }
    val full = fkReports.foldLeft(localReport)(_ unionByName _)
    full.select(col("check_name"), col("violations"), col("n_rows"),
      expr("(1000000 * violations) DIV n_rows").as("violation_ppm"))
  }

  /** Column profiling — the discovery half of the Deequ stage (per-column
    * null count, distinct count, min, max), the summary a pipeline reads
    * BEFORE authoring [[report]] constraints. Same scale shape: one
    * aggregation pass total (4 aggregate columns per profiled column),
    * unpivoted to one report row per column; O(#columns) output.
    *
    * min/max serialize as strings so heterogeneous column types share one
    * report schema; fractional types route through DECIMAL(18,6) fixed
    * point (raw double→string formatting differs across engines — the
    * repo-wide serialization rule), integers and strings cast directly. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile: empty column list")
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val fractional = df.schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      .map(_.name).toSet
    def asStr(c: Column, name: String): Column =
      if (fractional(name)) c.cast("decimal(18,6)").cast("string")
      else c.cast("string")
    val aggCols = columns.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        asStr(min(col(c)), c).as(s"mn_$c"),
        asStr(max(col(c)), c).as(s"mx_$c"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(columns.map { c =>
          struct(lit(c).as("column_name"), col(s"nn_$c").as("n_null"),
            col(s"nd_$c").as("n_distinct"), col(s"mn_$c").as("min_value"),
            col(s"mx_$c").as("max_value"))
        }: _*)).as("r"), col("__n").as("n_rows"))
      .select(col("r.column_name"), col("n_rows"), col("r.n_null"),
        col("r.n_distinct"), col("r.min_value"), col("r.max_value"))
  }

  /** Two-sample Kolmogorov–Smirnov distribution drift over a NUMERIC column
    * — the distribution-shape sibling of [[profile]]'s min/max and
    * [[graft.operators.CorpusOps.unigramDrift]]'s token-level JS: did the
    * new snapshot's length (score, latency, …) DISTRIBUTION move, even when
    * every row passes its range checks? KS statistic = max over values of
    * |F_a(v) − F_b(v)|, computed EXACTLY in integer arithmetic: the CDFs'
    * difference at v is |cumA(v)·nB − cumB(v)·nA| / (nA·nB), so the max is
    * found on integer cross-products and only the final report divides
    * (floored to ppm) — no float comparison anywhere, any engine agrees.
    *
    * Scale shape: per-side value-count aggregates (map-combined; ties
    * collapse here, which is also the correct KS treatment of ties), one
    * full-outer merge on value, and the house two-phase prefix sum over
    * DISTINCT values for the running counts — no corpus-wide single
    * partition window, no collect beyond the per-partition base sums.
    *
    * Output: ONE row (n_a, n_b, ks_ppm, at_value) — at_value is the
    * smallest value attaining the max (deterministic tie pin). Empty side
    * ⇒ ks_ppm = 1000000 against any non-empty other side; BOTH sides empty
    * ⇒ the single row is all-NULL (no data, no drift claim). */
  def ksDrift(a: DataFrame, aValCol: String,
              b: DataFrame, bValCol: String): DataFrame = {
    // the value keeps the CALLER's dtype — casting (the r15 review catch)
    // would truncate fractional score columns onto one integer and report
    // zero drift for totally-moved distributions; any orderable type works
    // (grouping, range-ordering and min are all dtype-generic; only the
    // COUNTS enter arithmetic)
    val ca = a.groupBy(col(aValCol).as("_v")).agg(count(lit(1)).as("_na"))
    val cb = b.groupBy(col(bValCol).as("_v")).agg(count(lit(1)).as("_nb"))
    val merged = ca.join(cb, Seq("_v"), "full_outer")
      .select(col("_v"), coalesce(col("_na"), lit(0L)).as("_fa"),
        coalesce(col("_nb"), lit(0L)).as("_fb"))
      .localCheckpoint(true) // read by totals + both prefix-sum passes
    val totals = merged.agg(sum("_fa").as("_ta"), sum("_fb").as("_tb"))
    // inclusive running counts: exclusive prefix + the value's own count
    val cumA = CorpusOps.prefixSum(
      merged.withColumn("_n", col("_fa")), Seq(col("_v")), "_pa")
      .withColumn("_ca", col("_pa") + col("_fa"))
    val cum = CorpusOps.prefixSum(
      cumA.withColumn("_n", col("_fb")), Seq(col("_v")), "_pb")
      .withColumn("_cb", col("_pb") + col("_fb"))
    // cross-products in DECIMAL(38,0): _ca·_tb reaches n_a·n_b, which wraps
    // silently in BIGINT past 2^63 (~3e9 rows per side — within the claimed
    // scale) while the DuckDB twin promotes to HUGEINT; DECIMAL keeps dd
    // exact on both engines at any realistic corpus size (r15 advice)
    val diffs = cum.crossJoin(broadcast(totals))
      .select(col("_v"), col("_ta"), col("_tb"),
        abs(col("_ca").cast("decimal(38,0)") * col("_tb") -
          col("_cb").cast("decimal(38,0)") * col("_ta")).as("_d"))
      .localCheckpoint(true) // read by the max and the argmin-at-max filter
    val dmax = diffs.agg(max(col("_d")).as("_dmax"))
    diffs.crossJoin(broadcast(dmax))
      .filter(col("_d") === col("_dmax"))
      .agg(first(col("_ta")).as("n_a"), first(col("_tb")).as("n_b"),
        first(col("_dmax")).as("_dm"), min(col("_v")).as("at_value"))
      // ks_ppm = floor(1e6·dd / (n_a·n_b)) computed ONLY with BIGINT DIV/MOD
      // (the one integer division both engines perform identically — Spark's
      // DECIMAL DIV truncates exactly but DuckDB's `//` on DECIMAL true-
      // divides in DOUBLE and rounds, the cs10 drift class). Nested floor
      // identity floor(floor(x/hi)/lo) = floor(x/(hi·lo)) lets the divide
      // run largest-total-first so every intermediate fits BIGINT whenever
      // max(n_a,n_b) ≤ 9.2e12; beyond that the least() guards saturate
      // IDENTICALLY on both engines (documented bound, never engine drift).
      .withColumn("_hi", expr("greatest(greatest(n_a, 1), greatest(n_b, 1))"))
      .withColumn("_lo", expr("least(greatest(n_a, 1), greatest(n_b, 1))"))
      .withColumn("_ddb", // dd saturated into BIGINT: exact while n_a·n_b < 2^63
        expr("CAST(least(_dm, CAST(9223372036854775807 AS DECIMAL(38,0))) AS BIGINT)"))
      .select(col("n_a"), col("n_b"),
        // BOTH sides empty -> the all-NULL row (no data, no drift claim).
        // Pinned explicitly: least()/greatest() SKIP nulls rather than
        // propagate them, so without this branch a NULL _dm would read as
        // Long.MaxValue and the division would emit garbage (r16 review).
        when(col("n_a").isNull || col("n_b").isNull, lit(null).cast("long"))
          // the cross-product form degenerates to 0 when a SIDE is empty
          // (t=0 kills both terms) — but an empty side against a non-empty
          // one is TOTAL drift, the documented ks = 1 contract
          .when((col("n_a") === 0) =!= (col("n_b") === 0), lit(1000000L))
          .otherwise(expr(
            "((_ddb DIV _hi) * 1000000 + " + // quotient ≤ _lo ≤ 3e9 ⇒ ·1e6 safe
              "CAST(least(CAST(_ddb % _hi AS DECIMAL(38,0)) * 1000000, " +
              "CAST(9223372036854775807 AS DECIMAL(38,0))) AS BIGINT) DIV _hi) " +
              "DIV _lo")).as("ks_ppm"),
        col("at_value"))
  }
}
