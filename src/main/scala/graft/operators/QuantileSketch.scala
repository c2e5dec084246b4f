package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable bounded-memory quantile sketch (cs11) — the rank-error member
  * of the sketch family: cs1's exact quantiles pay a full per-group sort and
  * cs6's equi-width histogram has bounded VALUE error but unbounded RANK
  * error on heavy-tailed distributions; this sketch bounds rank error with
  * O(cap) state.
  *
  * Structure: the KLL compactor cascade (Karnin–Lang–Liberty 2016) with the
  * per-compaction coin DERANDOMIZED by the house md5 hash — the compaction
  * from level l to l+1 keeps exactly the items whose hash has more than l
  * trailing zero bits, so an item's terminal level is `tz(h(id))` and the
  * whole sketch is {x : tz(h(x)) >= L} at the smallest level L whose
  * survivor count fits `cap`, every survivor carrying weight 2^L. What the
  * derandomization buys over coin-flip KLL:
  *  - the sketch is a PURE FUNCTION of the input multiset — replayable in
  *    ANSI SQL (the cs11 oracle row recomputes it end to end in DuckDB);
  *  - merge is bit-equal to one-shot: count(L) is monotone in the input, so
  *    the combined level L* >= max(La, Lb), and every item with
  *    tz >= L* survives in whichever side it arrived — merge = concat +
  *    refilter, no approximation drift across a stream
  *    ([[graft.streaming.StreamingOps.kllMaintain]] + StreamingSpec);
  *  - retries/repartitionings cannot change an answer (house rule).
  * The price is the error bound: per-item coins make each level a uniform
  * hash-sample, so rank error is the sampling O(sqrt(log n)/sqrt(cap))
  * rather than coin-flip KLL's O(log(1/d)/cap) — measured against the exact
  * answer by Bench's [kll-error] line, honest-loss style (fi2 precedent).
  *
  * Scale shape: one map-side tz histogram (<= 33 rows) to choose the level
  * IN SQL (a suffix-count window over the histogram — the same selection
  * for single-group and grouped forms since r17, so nothing ever touches
  * the driver and plan construction runs zero jobs), one distributed filter
  * to keep ~cap rows; ranking/estimation then run on the cap-bounded
  * survivor set (the only unpartitioned windows are over <= 33 histogram
  * rows and <= cap survivors — bounded by contract, the bt1 pattern). No
  * corpus sort, no corpus window, no collect anywhere.
  */
object QuantileSketch {

  /** Trailing zero bits of the 32-bit house hash (h == 0 -> 32). `h & -h`
    * isolates the lowest set bit; log2 of an exact power of two is exact in
    * IEEE double on any engine, rounded to kill last-ulp libm wobble. SQL
    * twin: `CASE WHEN h = 0 THEN 32 ELSE CAST(round(log2(h & -h)) AS INT) END`. */
  private def tzOf(h: Column): Column =
    when(h === 0, lit(32)).otherwise(
      round(log2((h.bitwiseAND(-h)).cast("double"))).cast("int"))

  /** Input rows hashed and leveled: (_v value, _id id-as-string, _h, _tz).
    * The id enters the hash as `seed|id` so independent sketches over the
    * same ids draw independent levels. Rows with a NULL value or id are
    * excluded by contract (a NULL id has no hash, so no level; a NULL value
    * would sort NULLS FIRST in Spark but NULLS LAST in the SQL twin and
    * drift the rank reads) — a guard, not a behavior change: both cs11/cs12
    * inputs are non-null. */
  def leveled(df: DataFrame, valueCol: String, idCol: String,
              seed: String = "kll"): DataFrame = {
    val h = Hashing.md5Long(concat(lit(seed + "|"), col(idCol).cast("string")))
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(valueCol).as("_v"), col(idCol).cast("string").as("_id"),
        h.as("_h"))
      .withColumn("_tz", tzOf(col("_h")))
  }

  /** The grouping column [[build]]/[[merge]] add to route the single-group
    * paths through [[buildByGroup]]'s SQL suffix-count level selection — ONE
    * selection implementation for both forms (r17): the single-group paths
    * previously collected a 33-row histogram plus two `.head()` actions per
    * [[graft.streaming.StreamingOps.kllMaintain]] micro-batch; as a constant
    * group they are pure plan construction — ZERO driver jobs until the
    * caller acts (Round17OpsSpec pins the job count via a listener). */
  private val OneGroup = "_kll_one"

  /** The sketch: survivor rows at the smallest level whose survivor count
    * fits `cap`. Columns (_v, _id, _h, _tz, _level) — _level is constant,
    * carried so a persisted sketch (streaming state) knows its own floor at
    * merge time.
    *
    * ONE md5 pass instead of two (r19, guide §1.2 "remove unnecessary
    * passes"): the lazy constant-group form computed the per-row md5 chain
    * in BOTH plan branches — the tz histogram and the survivor filter each
    * re-scanned the corpus (measured at sf0.1: each pass ~1.1 s of which
    * ~0.45 s is the hash chain; the two-branch build 3.4 s). This path
    * instead (1) counts the valid rows — a column-pruned scan, no hash
    * (isnotnull over the null-intolerant projections collapses to source
    * null checks); (2) prefilters ONE hashed pass to `_tz >= lHat` where
    * lHat = max(0, floor(log2(n/cap)) − 3) and checkpoints the ~2³·cap-row
    * superset; (3) selects the level driver-side from the superset's ≤ 33-row
    * histogram. Output-invariant: cnt(lHat) > cap forces the true level
    * above lHat, where the superset's suffix counts equal the full
    * multiset's; if the md5 stream anti-concentrates so far that
    * cnt(lHat) <= cap with lHat > 0 (a ~8×-below-mean binomial deviation —
    * never observed; Chernoff puts it past e^{-700} at cap 256), the exact
    * two-pass form recomputes from scratch. Degenerate inputs whose ids are
    * massively duplicated can inflate the superset toward the corpus (every
    * copy shares one hash) — they produce the same sketch either way, just
    * without the saving. EAGER: runs the count + checkpoint + histogram at
    * construction (3 bounded driver actions); streaming maintenance
    * ([[merge]]/[[graft.streaming.StreamingOps.kllMaintain]]) never calls
    * this — its per-batch path stays the lazy [[mergeByGroup]] SQL. */
  def build(df: DataFrame, valueCol: String, idCol: String,
            cap: Int = 256, seed: String = "kll"): DataFrame = {
    require(cap > 0, s"cap must be > 0, got $cap")
    val lv = leveled(df, valueCol, idCol, seed)
    val n = lv.count()
    if (n == 0) return lv.withColumn("_level", lit(0))
    val lHat = math.max(0,
      (if (n / cap > 0) 63 - java.lang.Long.numberOfLeadingZeros(n / cap)
       else 0) - 3)
    val sup = lv.filter(col("_tz") >= lHat).localCheckpoint(true)
    val hist = sup.groupBy("_tz").agg(count(lit(1)).as("_c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    val cntHat = hist.map(_._2).sum
    if (lHat == 0 || cntHat > cap) {
      // the original selection, on suffix counts that provably agree with
      // the full multiset: L = 1 + max{tz : s(tz) > cap}, or 0 when no
      // level's suffix count exceeds cap
      var suffix = 0L
      var maxBad = -1
      hist.foreach { case (tz, c) =>
        suffix += c
        if (suffix > cap && tz > maxBad) maxBad = tz
      }
      val level = maxBad + 1
      sup.filter(col("_tz") >= level).withColumn("_level", lit(level))
    } else {
      // anti-concentration fallback: exact, never wrong, ~never taken
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(sup)
      buildByGroup(df.withColumn(OneGroup, lit(1)), Seq(OneGroup),
        valueCol, idCol, cap, seed).drop(OneGroup)
    }
  }

  /** Merge two sketches (or a sketch and a fresh `leveled` batch tagged with
    * `_level` 0): union, re-choose the level with floor = max of the two,
    * refilter. Bit-equal to one-shot `build` over the combined input —
    * count(L) for L >= max(La, Lb) is identical on the union of survivors
    * and on the full multiset, because a discarded item had tz < its side's
    * level <= L. Lazy (the constant-group [[mergeByGroup]]): no driver jobs
    * until the caller acts. */
  def merge(a: DataFrame, b: DataFrame, cap: Int): DataFrame =
    mergeByGroup(a.withColumn(OneGroup, lit(1)), b.withColumn(OneGroup, lit(1)),
      Seq(OneGroup), cap).drop(OneGroup)

  /** Quantile estimates from a sketch: for each q in `qPcts` (percent,
    * 1..99), the survivor value at rank ceil(q*m/100) in (value, hash, id)
    * canonical order — integer arithmetic only, so any engine agrees.
    * Output: (q_pct BIGINT, est <value dtype>, level BIGINT, m_kept BIGINT).
    * Empty sketch -> empty result (no data, no estimate). */
  def quantilesFromSketch(sketch: DataFrame, qPcts: Seq[Int]): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 99),
      s"qPcts must be in 1..99, got $qPcts")
    val spark = sketch.sparkSession
    import spark.implicits._
    // the window is over the cap-bounded survivor set (bounded by contract)
    val ranked = sketch
      .withColumn("_rn", row_number().over(
        Window.orderBy(col("_v"), col("_h"), col("_id"))))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy()))
    val qs = qPcts.toDF("q_pct")
    ranked.join(broadcast(qs),
        col("_rn") === greatest(lit(1L), expr("(q_pct * _m + 99) DIV 100")))
      .select(col("q_pct").cast("long"),
        col("_v").as("est"), col("_level").cast("long").as("level"),
        col("_m").cast("long").as("m_kept"))
      .orderBy(col("q_pct"))
  }

  /** End-to-end: build the sketch and estimate `qPcts` quantiles of
    * `valueCol`. The cs11 board entry. */
  def quantiles(df: DataFrame, valueCol: String, idCol: String,
                cap: Int = 256, seed: String = "kll",
                qPcts: Seq[Int] = Seq(1, 5, 10, 25, 50, 75, 90, 95, 99)): DataFrame =
    quantilesFromSketch(build(df, valueCol, idCol, cap, seed), qPcts)

  /** Per-GROUP sketched quantiles — the fully distributed form: unlike
    * [[quantiles]] (one 33-row histogram collect), nothing touches the
    * driver, so a million groups cost one shuffle, not a million jobs.
    * Level selection per group runs as plain SQL over the (group, tz)
    * histogram: s(tz) = suffix count of items at level ≥ tz (one ≤34-row
    * window per group), and the smallest feasible level is 0 when the
    * group fits cap outright, else 1 + max{tz : s(tz) > cap} (s is a
    * non-increasing step function, so the next level after the last
    * infeasible one is feasible). Survivor ranking windows are partitioned
    * by group and cap-bounded. Same estimator as the single-group path —
    * and the same SQL replay, per group (the cs12 oracle row).
    * Output: (groupCols*, q_pct, est, level, m_kept). Groups whose survivor
    * set is empty (impossible: cap ≥ 1 keeps at least one item when the
    * group is non-empty) simply don't appear. */
  def quantilesByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String, cap: Int = 256, seed: String = "kll",
      qPcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame =
    quantilesFromSketchByGroup(
      buildByGroup(df, groupCols, valueCol, idCol, cap, seed), groupCols, qPcts)

  /** The grouped sketch: survivor rows (groupCols*, _v, _id, _h, _tz,
    * _level) with _level PER GROUP — the distributed-selection half of
    * [[quantilesByGroup]], exposed so streams can maintain it
    * ([[mergeByGroup]] / StreamingOps.kllMaintainByGroup). `floorOf`
    * (default absent) is an optional per-group floor frame
    * (groupCols*, _floor) — the merge path's monotonicity clamp.
    *
    * NULL contract (r17, documented + enforced): rows with a NULL group key
    * are EXCLUDED — previously they silently vanished in the using-column
    * join with the levels frame (NULL never equi-matches), which the SQL
    * twin happened to mirror; now the exclusion is an explicit entry filter
    * so the behavior is a contract, not a join accident. NULL value/id rows
    * are excluded for the [[leveled]] reasons (no hash / cross-engine NULL
    * sort drift). */
  def buildByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String, cap: Int, seed: String = "kll",
      floorOf: Option[DataFrame] = None): DataFrame = {
    require(groupCols.nonEmpty, "buildByGroup: no group columns")
    require(cap > 0, s"cap must be > 0, got $cap")
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val nonNullGroups = gcols.map(_.isNotNull).reduce(_ && _)
    val h = Hashing.md5Long(concat(lit(seed + "|"), col(idCol).cast("string")))
    val lv =
      if (df.columns.contains("_tz")) // already-leveled rows (merge path)
        df.filter(nonNullGroups)
          .select(gcols ++ Seq(col("_v"), col("_id"), col("_h"), col("_tz")): _*)
      else df.filter(nonNullGroups &&
          col(valueCol).isNotNull && col(idCol).isNotNull)
        .select(gcols :+ col(valueCol).as("_v") :+
          col(idCol).cast("string").as("_id") :+ h.as("_h"): _*)
        .withColumn("_tz", when(col("_h") === 0, lit(32)).otherwise(
          round(log2((col("_h").bitwiseAND(-col("_h"))).cast("double"))).cast("int")))
    val hist = lv.groupBy(gcols :+ col("_tz"): _*).agg(count(lit(1)).as("_c"))
      .withColumn("_s", sum(col("_c")).over( // suffix count: items at ≥ _tz
        Window.partitionBy(gcols: _*).orderBy(col("_tz").desc)))
    val minimal = hist.groupBy(gcols: _*)
      .agg(max(when(col("_s") > cap, col("_tz"))).as("_t"))
      .select(gcols :+
        coalesce(col("_t") + 1, lit(0)).cast("int").as("_lv0"): _*)
    val levels = floorOf match {
      case None => minimal.withColumnRenamed("_lv0", "_level")
      case Some(fl) => minimal
        .join(fl.select(gcols :+ col("_floor"): _*), groupCols, "left")
        .select(gcols :+ greatest(col("_lv0"),
          coalesce(col("_floor"), lit(0))).cast("int").as("_level"): _*)
    }
    // the constant-group (single-sketch) instance joins on ONE key value —
    // broadcast explicitly so the corpus never hash-shuffles onto a single
    // reducer even with AQE off; real groupings keep the planner's choice
    // (levels is group-count-sized there, possibly too big to broadcast)
    val levelsSide =
      if (groupCols == Seq(OneGroup)) broadcast(levels) else levels
    lv.join(levelsSide, groupCols).filter(col("_tz") >= col("_level"))
  }

  /** Merge two grouped sketches: union of survivor rows, per-group level
    * re-chosen with floor = max of the sides' levels for that group — the
    * per-group instance of [[merge]]'s bit-equality theorem (suffix counts
    * at any level ≥ the floor agree between the union of survivors and the
    * full multiset, because every discarded item sat below some earlier
    * level ≤ floor). */
  def mergeByGroup(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                   cap: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val u = a.unionByName(b)
    val floors = u.groupBy(gcols: _*).agg(max(col("_level")).as("_floor"))
    buildByGroup(u.drop("_level"), groupCols, "_v", "_id", cap,
      floorOf = Some(floors))
  }

  /** Quantile reads from a grouped sketch (the [[quantilesFromSketch]]
    * twin): per-group cap-bounded ranking windows, integer rank arithmetic.
    * Output: (groupCols*, q_pct, est, level, m_kept). */
  def quantilesFromSketchByGroup(sketch: DataFrame, groupCols: Seq[String],
      qPcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 99),
      s"qPcts must be in 1..99, got $qPcts")
    import org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val ranked = sketch
      .withColumn("_rn", row_number().over(Window.partitionBy(gcols: _*)
        .orderBy(col("_v"), col("_h"), col("_id"))))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(gcols: _*)))
    val qs = qPcts.toDF("q_pct")
    ranked.join(broadcast(qs),
        col("_rn") === greatest(lit(1L), expr("(q_pct * _m + 99) DIV 100")))
      .select(gcols ++ Seq(col("q_pct").cast("long"), col("_v").as("est"),
        col("_level").cast("long").as("level"),
        col("_m").cast("long").as("m_kept")): _*)
      .orderBy(gcols :+ col("q_pct"): _*)
  }

  // ============== r17: the equal-weight COLLAPSE compactor (cs13) ==============

  /** Compact quantile sketch with O(1/cap) DETERMINISTIC rank error — the
    * r17 accuracy upgrade over the level-sampler ([[build]])'s O(1/sqrt(cap))
    * sampling error at the SAME state size, keeping the house purity
    * contract: the sketch is a pure function of the input multiset,
    * replayable in ANSI SQL (the cs13 oracle row replays it end to end).
    *
    * Structure: the equal-weight COLLAPSE of the sorted multiset — the
    * compaction primitive of the MRL/KLL compactor families
    * (Manku–Rajagopalan–Lindsay 1998; Karnin–Lang–Liberty 2016) with the
    * selection coin derandomized to a SINGLE md5 phase: survivors are the
    * items at sorted ranks ≡ phase (mod stride) in (value, hash, id)
    * canonical order, stride = ceil(n/cap), phase = md5(seed, n) mod stride.
    * Why the shared phase instead of KLL's per-pair coins: every survivor's
    * exact rank is phase + k·stride — KNOWN — so a read for target rank r
    * returns the nearest survivor with error <= stride/2 = ceil(n/cap)/2,
    * a deterministic WORST-CASE bound (interior quantiles), where the
    * pairwise tournament pays dyadic quantization (~2x looser at the same
    * cap) and the sampler pays a concentration bound. At cap 256 that is
    * <= 0.195% guaranteed vs the sampler's measured ~3.7% max — the two are
    * published side by side in Bench's [kll-error] line (the fi1/fi2 A/B
    * convention).
    *
    * Scale shape: ONE range-partitioned sort of the input via the house
    * two-phase rank ([[CorpusOps.prefixSum]] with unit mass — per-partition
    * windows + broadcast partition bases; no single-partition window, and
    * the only driver state is one row per partition). The build is EAGER at
    * that step (prefixSum localCheckpoints so `_pid` is identical across
    * its two passes — rank consistency must not depend on exchange reuse;
    * r17 review finding). The sort is the price of rank-exact selection and
    * the honest A/B against [[build]]'s sort-free one-shuffle sketch:
    * collapse when batch accuracy matters, sampler when the build must stay
    * sort-free or the stream is unbounded (see [[mergeCompact]]'s error
    * accounting).
    *
    * Sketch rows: (_v, _id, _h, _r BIGINT exact-or-estimated 0-indexed rank,
    * _w BIGINT covered rank mass, _n BIGINT total mass, _s BIGINT stride) —
    * survivor k covers ranks [b_k, b_{k+1}) with b_0 = 0 and b_k = _r(k)
    * otherwise, so weights sum to n exactly. Same NULL contract as
    * [[leveled]]. */
  def compactSketch(df: DataFrame, valueCol: String, idCol: String,
      cap: Int = 256, seed: String = "kll"): DataFrame = {
    require(cap > 0, s"cap must be > 0, got $cap")
    // global 0-indexed rank = exclusive prefix sum of unit mass in canonical
    // order — CorpusOps.prefixSum, the shared two-phase rank (also under
    // pk1/x13/ksDrift), rather than a third hand-rolled copy of the shape
    val lv = leveled(df, valueCol, idCol, seed).drop("_tz")
      .withColumn("_n", lit(1L))
    val ranked0 = CorpusOps.prefixSum(lv,
      Seq(col("_v"), col("_h"), col("_id")), "_r").drop("_n")
    val total = ranked0.agg(count(lit(1)).as("_n"))
    val ranked = ranked0
      .crossJoin(broadcast(total))
      .withColumn("_s", expr(s"(_n + ${cap - 1}) DIV $cap"))
      .withColumn("_phi", pmod(Hashing.md5Long(
        concat(lit(seed + "|collapse|"), col("_n").cast("string"))), col("_s")))
    ranked
      .filter(pmod(col("_r"), col("_s")) === col("_phi"))
      .select(col("_v"), col("_id"), col("_h"), col("_r"),
        // b_{k+1} - b_k: next grid rank (or n) minus this coverage start
        // (the FIRST survivor absorbs the [0, phase) head)
        (least(col("_r") + col("_s"), col("_n")) -
          when(col("_r") === col("_phi"), lit(0L)).otherwise(col("_r"))).as("_w"),
        col("_n"), col("_s"))
  }

  /** Quantile reads from a compact sketch: 0-indexed target rank
    * t = max(1, ceil(q·n/100)) − 1; the estimate is the survivor whose rank
    * `_r` is nearest t (ties to the lower rank) — for a one-shot
    * [[compactSketch]] the error is <= stride/2 ranks, deterministic, for
    * INTERIOR quantiles (a target below the md5 phase or above the last
    * grid point has only a one-sided neighbor, so the extreme reads can
    * err up to stride−1; qPcts is bounded to 1..99 but a tiny q on a huge
    * n can still land in the head gap). The bound is a RANK bound: a long
    * run of duplicate values can make the VALUE at the returned rank equal
    * the target's anyway — the bound never benefits from that, it is
    * worst-case over rank distance. After a [[mergeCompact]] fold the
    * published `stride` is advisory (the max input stride or the resample
    * stride — see mergeCompact's additive error accounting); only a
    * one-shot sketch's stride certifies <= stride/2.
    * Integer arithmetic only; windows over the cap-bounded survivor set.
    * Output: (q_pct BIGINT, est, stride BIGINT, m_kept BIGINT); empty
    * sketch -> empty result. */
  def quantilesFromCompact(sketch: DataFrame, qPcts: Seq[Int]): DataFrame =
    // the empty-group instance of the grouped read (r18 review
    // unification): with no group columns its windows and ordering are
    // exactly this read's pre-unification forms
    quantilesFromCompactByGroup(sketch, Seq.empty, qPcts)

  /** End-to-end collapse-compactor quantiles — the cs13 board entry. */
  def quantilesCompact(df: DataFrame, valueCol: String, idCol: String,
      cap: Int = 256, seed: String = "kll",
      qPcts: Seq[Int] = Seq(1, 5, 10, 25, 50, 75, 90, 95, 99)): DataFrame =
    quantilesFromCompact(compactSketch(df, valueCol, idCol, cap, seed), qPcts)

  /** Merge two compact sketches: weighted systematic RESAMPLE of the union
    * onto the combined grid — sort the union canonically, accumulate
    * coverage mass, lay the new grid (stride' = ceil(n'/cap), phase' =
    * md5(seed, n') mod stride') over the cumulative-mass axis, and emit the
    * item whose coverage interval contains each grid point (a heavy item
    * can host several grid points and is emitted once per point). When the
    * union already fits cap nothing is resampled — rows keep their weights,
    * ranks re-reference to the union's cumulative mass. Deterministic: a
    * pure function of the two sketches, so a maintained fold is exactly
    * replayable (StreamingSpec pins it).
    *
    * Error accounting (honest, the fi2 convention): each resample adds
    * <= stride'/2 rank error ON TOP of the inputs' own, so a sequential
    * fold over B micro-batches accumulates O(Σ_k stride_k/2) — linear in B
    * in the worst case, unlike the level-sampler whose maintained error is
    * B-independent (its merge is bit-equal to one-shot). That is the A/B:
    * [[mergeCompact]] for few-way merges (shard fan-in, where the
    * deterministic per-merge bound wins), [[merge]] (cs11) for unbounded
    * streams. StreamingSpec measures the folded error beside the one-shot
    * bound. All windows here are over <= |a|+|b| <= 2·cap rows — bounded by
    * the sketch-size contract. The output `_s` is ADVISORY after a merge
    * (resample branch: the new grid stride; keep branch: the max input
    * stride — never a per-row source stride, which would understate the
    * envelope for rows from the finer side): the true folded error is the
    * additive sum above, which only the caller's fold history knows. */
  def mergeCompact(a: DataFrame, b: DataFrame, cap: Int,
      seed: String = "kll"): DataFrame =
    // the single-group instance of the grouped impl (r18 review: the two
    // bodies were near-duplicate windowed-resample logic that had to be
    // fixed in lockstep — the r17 cs11-onto-cs12 unification precedent).
    // With NO group columns the phase string and windows degenerate to
    // exactly the pre-unification single-group forms, so existing folds
    // replay bit-equal (CompactPropertySpec/StreamingSpec pin it).
    mergeCompactImpl(a, b, Seq.empty, cap, seed)

  /** Per-GROUP collapse compactor (cs14) — completing the family square:
    * cs11/cs12 are the sort-free O(1/sqrt(cap)) samplers (single/grouped),
    * cs13/cs14 the O(1/cap) collapses (single/grouped). Survivors per group
    * at group-sorted ranks ≡ group-phase (mod group-stride), stride =
    * ceil(n_g/cap), phase = md5(seed, groupKey, n_g) mod stride — the
    * per-group instance of [[compactSketch]], same deterministic
    * <= stride/2 read bound per group, same SQL replay per group (the cs14
    * oracle row).
    *
    * Scale shape + honest price: the per-group rank is a window PARTITIONED
    * BY GROUP over the raw rows — each group sorts within one task (the cs1
    * exact-quantiles shape; a mega-group is a skew risk there too). That is
    * the grouped analogue of cs13's global sort. When groups are huge and
    * skewed, cs12 (sampler — one shuffle, no sort) is the right tool; cs14
    * buys the 19x-tighter deterministic bound where per-group sorts are
    * affordable. NULL contract: [[buildByGroup]]'s (group keys, value, id
    * all non-null).
    * Output rows: (groupCols*, _v, _id, _h, _r, _w, _n, _s). */
  def compactSketchByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String, cap: Int = 256,
      seed: String = "kll"): DataFrame = {
    require(groupCols.nonEmpty, "compactSketchByGroup: no group columns")
    require(cap > 0, s"cap must be > 0, got $cap")
    val gcols = groupCols.map(col)
    val nonNull = (gcols :+ col(valueCol) :+ col(idCol))
      .map(_.isNotNull).reduce(_ && _)
    val h = Hashing.md5Long(concat(lit(seed + "|"), col(idCol).cast("string")))
    val lv = df.filter(nonNull)
      .select(gcols :+ col(valueCol).as("_v") :+
        col(idCol).cast("string").as("_id") :+ h.as("_h"): _*)
    val ranked = lv
      .withColumn("_r", row_number().over(Window.partitionBy(gcols: _*)
        .orderBy(col("_v"), col("_h"), col("_id"))) - 1)
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(gcols: _*)))
      .withColumn("_s", expr(s"(_n + ${cap - 1}) DIV $cap"))
      .withColumn("_phi", pmod(Hashing.md5Long(concat(
        lit(seed + "|collapse|"),
        concat_ws("|", gcols.map(_.cast("string")): _*),
        lit("|"), col("_n").cast("string"))), col("_s")))
    ranked
      .filter(pmod(col("_r"), col("_s")) === col("_phi"))
      .select(gcols ++ Seq(col("_v"), col("_id"), col("_h"), col("_r"),
        (least(col("_r") + col("_s"), col("_n")) -
          when(col("_r") === col("_phi"), lit(0L)).otherwise(col("_r"))).as("_w"),
        col("_n"), col("_s")): _*)
  }

  /** Per-group quantile reads from a grouped compact sketch — the
    * [[quantilesFromCompact]] twin: nearest-rank read inside each group,
    * windows over the per-group cap-bounded survivor sets. The same read
    * caveats apply PER GROUP: the <= stride/2 certificate holds for
    * interior quantiles of a one-shot [[compactSketchByGroup]] (extreme
    * targets in the head/tail gap can err up to stride−1), the bound is a
    * rank bound regardless of duplicate-value runs, and after a grouped
    * merge fold the published stride is advisory. Output:
    * (groupCols*, q_pct, est, stride, m_kept). */
  def quantilesFromCompactByGroup(sketch: DataFrame, groupCols: Seq[String],
      qPcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 99),
      s"qPcts must be in 1..99, got $qPcts")
    val spark = sketch.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val qs = qPcts.toDF("q_pct")
    sketch
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(gcols: _*)))
      .crossJoin(broadcast(qs))
      .withColumn("_t", greatest(lit(1L), expr("(q_pct * _n + 99) DIV 100")) - 1)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(gcols :+ col("q_pct"): _*)
          .orderBy(abs(col("_r") - col("_t")), col("_r"))))
      .filter(col("_rn") === 1)
      .select(gcols ++ Seq(col("q_pct").cast("long"), col("_v").as("est"),
        col("_s").cast("long").as("stride"),
        col("_m").cast("long").as("m_kept")): _*)
      .orderBy(gcols :+ col("q_pct"): _*)
  }

  /** Merge two GROUPED compact sketches — the per-group instance of
    * [[mergeCompact]], completing the maintained quarter of the sketch
    * square (cs11/cs12 sampler single/grouped, cs13/cs14 collapse
    * single/grouped — r17 left cs14 build-only). Within each group: sort
    * the union canonically, accumulate coverage mass, lay the group's new
    * grid (stride' = ceil(n'_g/cap), phase' = md5(seed, groupKey, n'_g)
    * mod stride' — the [[compactSketchByGroup]] phase convention) over the
    * cumulative-mass axis, and emit the item covering each grid point; a
    * group whose union already fits cap keeps every row (weights intact,
    * ranks re-referenced, `_s` = the group's max input stride — the
    * [[mergeCompact]] advisory convention). Deterministic per group, so a
    * maintained fold replays bit-equal.
    *
    * Error accounting is PER GROUP and additive exactly as in
    * [[mergeCompact]]: each resample of group g adds <= stride'_g/2 rank
    * error on top of the inputs' own — linear in the number of folds
    * worst-case. The A/B stands per group too: this for few-way fan-in
    * where the deterministic bound wins, [[mergeByGroup]] (cs12 sampler,
    * merge bit-equal to one-shot) for unbounded streams. All windows are
    * per-group over <= 2·cap survivor rows — bounded by the sketch-size
    * contract, never by group size. */
  def mergeCompactByGroup(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      cap: Int, seed: String = "kll"): DataFrame = {
    require(groupCols.nonEmpty, "mergeCompactByGroup: no group columns")
    mergeCompactImpl(a, b, groupCols, cap, seed)
  }

  /** The shared merge body ([[mergeCompact]] = empty groupCols,
    * [[mergeCompactByGroup]] = non-empty): with no group columns every
    * window is global and the phase string omits the group segment, so the
    * degenerate case IS the original single-group merge bit-for-bit. */
  private def mergeCompactImpl(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], cap: Int, seed: String): DataFrame = {
    require(cap > 0, s"cap must be > 0, got $cap")
    val gcols = groupCols.map(col)
    val cols = gcols ++ Seq("_v", "_id", "_h", "_r", "_w", "_n", "_s").map(col)
    val u = a.select(cols: _*).unionByName(b.select(cols: _*))
    val gwin = Window.partitionBy(gcols: _*)
    val ord = gwin.orderBy(col("_v"), col("_h"), col("_id"), col("_r"))
    // the compactSketch(ByGroup) phase convention: group segment only when
    // grouped, so single-group folds stay replay-compatible
    val phaseKey =
      if (groupCols.isEmpty)
        concat(lit(seed + "|collapse|"), col("_nn").cast("string"))
      else concat(lit(seed + "|collapse|"),
        concat_ws("|", gcols.map(_.cast("string")): _*),
        lit("|"), col("_nn").cast("string"))
    val cum = u
      .withColumn("_cum", coalesce(sum(col("_w")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_nn", sum(col("_w")).over(gwin))
      .withColumn("_mu", count(lit(1)).over(gwin))
      // keep-branch stride: the WORST input stride across the (group's)
      // union, not each row's own source stride — a post-merge read
      // publishes one `stride` per answer, and mixed source strides would
      // understate the error envelope for survivors that happened to come
      // from the finer side (r17 advice)
      .withColumn("_smax", max(col("_s")).over(gwin))
      .withColumn("_s2", expr(s"(_nn + ${cap - 1}) DIV $cap"))
      .withColumn("_phi", pmod(Hashing.md5Long(phaseKey), col("_s2")))
      // grid points j hosted by this item's coverage [_cum, _cum + _w):
      // phase' + j·stride' in that interval, clamped to the grid's extent
      .withColumn("_jlo", greatest(lit(0L),
        expr("(_cum - _phi + _s2 - 1) DIV _s2")))
      // an item entirely BEFORE the first grid point must host nothing:
      // Spark's DIV truncates toward zero, so a negative numerator would
      // round UP to 0 and double-emit grid point 0 (mass inflation — caught
      // by the StreamingSpec conservation check); pin it to -1 explicitly
      .withColumn("_jhi", when(col("_cum") + col("_w") - 1 < col("_phi"), lit(-1L))
        .otherwise(least(expr("(_nn - 1 - _phi) DIV _s2"),
          expr("(_cum + _w - 1 - _phi) DIV _s2"))))
      // keep-branch marker -1 when the union fits cap (no resample);
      // a reversed range means "hosts no grid point" -> drop via explode
      .withColumn("_j", explode(when(col("_mu") <= cap, array(lit(-1L)))
        .otherwise(when(col("_jhi") >= col("_jlo"),
          sequence(col("_jlo"), col("_jhi")))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))))
    cum.select(gcols ++ Seq(col("_v"), col("_id"), col("_h"),
      when(col("_j") === -1L, col("_cum"))
        .otherwise(col("_phi") + col("_j") * col("_s2")).as("_r"),
      when(col("_j") === -1L, col("_w"))
        .otherwise( // same b-interval convention as compactSketch
          least(col("_phi") + (col("_j") + 1) * col("_s2"), col("_nn")) -
            when(col("_j") === 0L, lit(0L))
              .otherwise(col("_phi") + col("_j") * col("_s2"))).as("_w"),
      col("_nn").as("_n"),
      when(col("_j") === -1L, col("_smax")).otherwise(col("_s2")).as("_s")): _*)
  }

  /** End-to-end grouped collapse quantiles — the cs14 board entry. */
  def quantilesCompactByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String, cap: Int = 256, seed: String = "kll",
      qPcts: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame =
    quantilesFromCompactByGroup(
      compactSketchByGroup(df, groupCols, valueCol, idCol, cap, seed),
      groupCols, qPcts)

  /** Exact-rank error of a sketch's estimates against the true distribution:
    * for each q, |rank(est)/n - q/100| where rank(est) = #{v <= est}. ONE
    * corpus scan: the ≤ 9 estimates broadcast-cross-join every row and a
    * map-side-combined aggregate counts v ≤ est per estimate (n rides along
    * as the group count). Returns (q_pct, est, rank_err_ppm). Bench's
    * [kll-error] line reads max/mean. */
  def rankError(df: DataFrame, valueCol: String, estimates: DataFrame): DataFrame =
    df.select(col(valueCol).as("_val"))
      .crossJoin(broadcast(estimates.select(col("q_pct"), col("est"))))
      .groupBy(col("q_pct"), col("est"))
      .agg(sum(when(col("_val") <= col("est"), 1L).otherwise(0L)).as("_rank"),
        count(lit(1)).as("_n"))
      .select(col("q_pct"), col("est"),
        expr("abs(_rank * 1000000 DIV greatest(_n, 1) - q_pct * 10000)")
          .as("rank_err_ppm"))
}
