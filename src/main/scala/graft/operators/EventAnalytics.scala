package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics over an event stream table — the funnel and
  * cohort-retention reads every product/telemetry pipeline runs beside
  * sessionization ([[Sessionize]]). Batch forms here; both are
  * incrementalizable the [[graft.streaming.StreamingOps]] way (per-user
  * state = current funnel stage / first-seen day, both watermark-bounded).
  *
  * Scale shapes:
  *  - funnel: step k is ONE (filtered events)⋈(step k−1 completions)
  *    equi-join on the user plus a min aggregate — survivor sets shrink
  *    monotonically, shuffles are user-keyed and map-side combined, and the
  *    per-step counts are one-row aggregates unioned at the end (scalar
  *    assembly, no data cross joins).
  *  - retention: day indexes via exact integer division of the epoch-ns
  *    long (a double division would lose integer precision past 2^53 and
  *    mis-bucket boundary events), one distinct (user, day) pass, a
  *    user-keyed cohort join, then a (cohort, offset) count — all hash
  *    aggregates, nothing driver-side.
  */
object EventAnalytics {

  /** Strictly-ordered funnel conversion: a user completes step k at their
    * earliest `steps(k)` event STRICTLY after their step k−1 completion
    * (same-timestamp events do not chain — a purchase logged in the same
    * nanosecond as the view it requires is not a conversion).
    * `tsCol` must be comparable (the engine's epoch-ns long convention).
    * Output: (step INT 1-based, event_type, n_users) — one row per step. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t"))
    var out = cur.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), lit(steps.head).as("event_type"), col("n_users"))
    for (k <- 1 until steps.length) {
      val next = events.filter(col(typeCol) === steps(k))
        .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      cur = cur.join(next, Seq("_u"))
        .filter(col("_ts") > col("_t"))
        .groupBy("_u").agg(min(col("_ts")).as("_t"))
      out = out.unionByName(cur.agg(count(lit(1)).as("n_users"))
        .select(lit(k + 1).as("step"), lit(steps(k)).as("event_type"), col("n_users")))
    }
    out
  }

  /** Time-to-convert distribution per funnel transition: for each step k ≥ 2,
    * the per-user latency t_k − t_{k−1} between consecutive [[funnel]]
    * completions in SECONDS, summarized as count + exact percentiles — the read that
    * turns a conversion funnel into an SLA (where do users stall, and for
    * how long). Same survivor-join chain as [[funnel]] (strict-after
    * chaining, so latencies are positive by construction); the percentile
    * is exact per step — for funnels whose per-step converter counts
    * outgrow a single sort, feed the latencies to the mergeable
    * [[CorpusOps.histogramSketch]]/[[CorpusOps.histogramQuantiles]] pair
    * instead (the cs1/cs6 pairing).
    *
    * Output: (step INT ≥ 2, event_type, n_users, p50, p90) — one row per
    * transition with ≥ 1 converter. */
  def funnelLatencies(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "funnelLatencies: need at least 2 steps")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t"))
    var out: DataFrame = null
    for (k <- 1 until steps.length) {
      val next = events.filter(col(typeCol) === steps(k))
        .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      val comp = cur.join(next, Seq("_u"))
        .filter(col("_ts") > col("_t"))
        .groupBy("_u", "_t").agg(min(col("_ts")).as("_t2"))
      val stats = comp
        // latency in SECONDS: percentile interpolation is correctly-rounded
        // float math on both engines, but at epoch-ns magnitudes (~1e14) one
        // ulp is ~0.02 — far above any sane rounding. Seconds keep the
        // interpolation noise ~1e-11, far below the 4-dp comparison.
        .select(((col("_t2") - col("_t")).cast("double") / lit(1e9)).as("_lat"))
        .agg(count(lit(1)).as("n_users"),
          expr("percentile(_lat, 0.5)").as("p50"), // exact: ≡ quantile_cont
          expr("percentile(_lat, 0.9)").as("p90"))
        .select(lit(k + 1).as("step"), lit(steps(k)).as("event_type"),
          col("n_users"), col("p50"), col("p90"))
        .filter(col("n_users") > 0)
      out = if (out == null) stats else out.unionByName(stats)
      cur = comp.select(col("_u"), col("_t2").as("_t"))
    }
    out
  }

  /** Rolling engagement: per observed day, DAU (distinct users that day),
    * WAU (distinct users in the trailing `windowDays`-day window ending that
    * day) and stickiness = DAU/WAU — the daily health read every event
    * pipeline publishes beside [[retention]].
    *
    * An exact distinct-over-range-window does not exist as a Spark window
    * function; the scale shape here is the standard rewrite: the distinct
    * (user, day) pass (the same frame retention starts from), then each
    * active day FANS OUT to the ≤`windowDays` window-end days it contributes
    * to (`sequence` explode — bounded by the window length, never by data),
    * a second distinct collapses a user active on several days of one
    * window, and a hash count per day finishes. Every shuffle is user- or
    * day-keyed and map-side combined; nothing is proportional to raw events
    * past the first distinct. Output rows only for days with activity
    * (window-end days no event landed on are not invented).
    *
    * Output: (day BIGINT epoch-day, dau, wau, stickiness DOUBLE rounded 6).
    */
  def rollingActive(events: DataFrame, userCol: String, tsNsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "rollingActive: windowDays must be >= 1")
    val DayNs = 86400000000000L
    val active = events
      .select(col(userCol).as("_u"), expr(s"$tsNsCol div $DayNs").as("_day"))
      .distinct()
      .localCheckpoint(true) // read by dau, the window fan-out, and the day list
    val dau = active.groupBy("_day").agg(count(lit(1)).as("dau"))
    val wau = active
      .select(col("_u"),
        explode(sequence(col("_day"), col("_day") + (windowDays - 1))).as("_day"))
      .distinct()
      .groupBy("_day").agg(count(lit(1)).as("wau"))
    // inner join to dau keeps observed days only: the fan-out invents
    // window-end days beyond the last activity, which have a WAU but no DAU
    dau.join(wau, Seq("_day"))
      .select(col("_day").as("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
  }

  /** Daily cohort retention: cohort(user) = the user's first active day
    * (exact integer epoch-ns division), and a (cohort_day, day_offset) cell
    * counts users active `day_offset` days after their cohort day, offsets
    * 0..maxOffset. A user active twice on one day counts once.
    * Output: (cohort_day BIGINT, day_offset BIGINT, n_users). */
  def retention(events: DataFrame, userCol: String, tsNsCol: String,
      maxOffset: Int): DataFrame = {
    val DayNs = 86400000000000L
    val active = events
      .select(col(userCol).as("_u"), expr(s"$tsNsCol div $DayNs").as("_day"))
      .distinct()
      .localCheckpoint(true) // read by the cohort agg and the retention join
    val cohort = active.groupBy("_u").agg(min(col("_day")).as("_c"))
    active.join(cohort, Seq("_u"))
      .select(col("_u"), col("_c"), (col("_day") - col("_c")).as("_off"))
      .filter(col("_off") <= maxOffset)
      .groupBy(col("_c").as("cohort_day"), col("_off").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Volume-anomaly days per event type: daily event counts z-scored against
    * the type's own history — the monitoring read that catches a broken
    * ingest feed (count collapses) or a bot burst (count spikes) before
    * either poisons a training corpus. A (type, day) cell is anomalous when
    * |count − μ_type| ≥ z·σ_type (population σ).
    *
    * Scale shape: one map-side-combined (type, day) count, then a type-sized
    * second aggregate for (n, Σc, Σc²) — both plain hash aggregates; the
    * final z-score join is broadcast (types × days vs #types). All sums are
    * exact BIGINTs; μ, σ and z are derived from them with identical IEEE
    * double steps on any engine, so the rounded z is engine-exact. Types
    * with a single observed day or zero variance emit no rows (σ = 0 —
    * every day is its own mean; an anomaly needs a distribution to violate).
    *
    * Output: (event_type, day BIGINT, n_events, z_r DOUBLE rounded 6),
    * anomalous cells only. */
  def anomalousDays(events: DataFrame, typeCol: String, tsNsCol: String,
      z: Double = 2.0): DataFrame = {
    val DayNs = 86400000000000L
    val daily = events
      .groupBy(col(typeCol).as("event_type"), expr(s"$tsNsCol div $DayNs").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint(true) // read by the stats aggregate and the z-score join
    anomalousDaysFromDaily(daily, z)
  }

  /** [[anomalousDays]] over a pre-aggregated (event_type, day, n_events)
    * frame — the entry point for incrementally-maintained daily counts (the
    * [[graft.streaming.StreamingOps]] anomaly state table): daily counts
    * are ADDITIVE across micro-batches, so the streamed state equals the
    * batch aggregate exactly and this derivation is shared verbatim.
    * CONTRACT: input pinned (it feeds the stats aggregate and the z-score
    * join). */
  def anomalousDaysFromDaily(daily: DataFrame, z: Double): DataFrame = {
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("_n"), sum(col("n_events")).as("_s"),
        sum(col("n_events") * col("n_events")).as("_ss"))
      .withColumn("_mu", col("_s").cast("double") / col("_n"))
      .withColumn("_sigma",
        sqrt(col("_ss").cast("double") / col("_n") - col("_mu") * col("_mu")))
      .filter(col("_sigma") > 0)
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("_z", (col("n_events") - col("_mu")) / col("_sigma"))
      .filter(abs(col("_z")) >= z)
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("_z"), 6).as("z_r"))
  }

  /** First-order Markov transition matrix over each user's event sequence:
    * P(next = b | current = a), estimated from consecutive event pairs in
    * per-user time order — the session-path read behind "what do users do
    * after X" and the generative model for synthetic event streams.
    *
    * Scale shape: ONE user-partitioned lead() window — per-user sequences
    * are session-scale (bounded), so no global sort exists anywhere; the
    * pair counts and the per-source totals are hash aggregates, and the
    * probability join is transition-matrix-sized (#types²). Equal-timestamp
    * events are ordered by `idCol` so the pairing is deterministic on every
    * engine. Output: (src_event, dst_event, n BIGINT, prob DOUBLE rounded
    * 6), transitions observed at least once. */
  def transitions(events: DataFrame, userCol: String, tsNsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsNsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsNsCol), col(idCol), col(typeCol).as("src_event"))
      .withColumn("dst_event", lead(col("src_event"), 1).over(w))
      .filter(col("dst_event").isNotNull)
      .groupBy("src_event", "dst_event")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // read by the totals aggregate and the prob join
    val totals = pairs.groupBy("src_event").agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(totals), Seq("src_event"))
      .select(col("src_event"), col("dst_event"), col("n"),
        round(col("n").cast("double") / col("_tot"), 6).as("prob"))
  }

  /** Exponentially time-decayed event counts per type — the "trending now"
    * read: each event contributes 2^(−age/halfLife) measured from the
    * stream's latest timestamp, so a type with recent volume outranks one
    * with the same raw count spread over history. The batch form of the
    * decayed counter every monitoring/ranking surface keeps; the streaming
    * twin is one more multiply-and-add per micro-batch (state = (count,
    * decayed-to-watermark) per type).
    *
    * Scale shape: ONE 1-row max aggregate for the reference time, broadcast
    * into a codegen'd weight projection, then one map-side-combined
    * per-type sum — two passes, no windows, no per-key sorts. The weight
    * sum is a double accumulation (order-sensitive at ~1e-13 relative);
    * callers round before cross-engine comparison.
    *
    * Output: (event_type, n_events BIGINT, decayed DOUBLE unrounded). */
  def decayedCounts(events: DataFrame, typeCol: String, tsNsCol: String,
      halfLifeDays: Double = 1.0): DataFrame = {
    require(halfLifeDays > 0, "decayedCounts: halfLifeDays must be > 0")
    val hlNs = halfLifeDays * 86400000000000.0
    val tmax = events.agg(max(col(tsNsCol)).as("_T"))
    events.crossJoin(broadcast(tmax))
      .select(col(typeCol).as("event_type"),
        pow(lit(2.0), -(col("_T") - col(tsNsCol)).cast("double") / hlNs).as("_w"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("_w")).as("decayed"))
  }

  /** Last-touch conversion attribution — which touch event (ad click, page
    * view, …) gets credit for each conversion: the read behind every
    * "which source drives purchases" decision, and in a training-data
    * pipeline the same kernel attributes a downstream outcome (a label, a
    * takedown, a complaint) to the last upstream pipeline event that
    * touched the document. Credit goes to the LAST touch at-or-before the
    * conversion (ties on timestamp broken by event id: only strictly
    * earlier (ts, id) rows count) and only if it is within `windowNs`;
    * conversions with no in-window touch surface with NULL touch columns
    * (the "organic" bucket) rather than vanishing.
    *
    * Scale shape — the 100 TB clickstream pattern: ONE window over the
    * user-partitioned event stream (`last(touch, ignoreNulls)` over rows
    * up to the current one), so the whole attribution is a single shuffle
    * on the user key and a per-partition sort — no conversions×touches
    * join, no per-conversion scans. The oracle pins the equivalent
    * bounded pair-join + rank-1 formulation; both pick the identical
    * (ts, id)-max touch.
    *
    * Output: one row per conversion — (conv_id, user, conv_ts, value,
    * touch_type, touch_id, touch_ts), touch columns NULL when organic. */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsNsCol: String,
      typeCol: String, idCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String, windowNs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution: no touch types")
    require(!touchTypes.contains(convType),
      "lastTouchAttribution: conversion type cannot also be a touch type")
    require(windowNs > 0, s"windowNs must be > 0, got $windowNs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsNsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = events
      .filter(col(typeCol).isin((touchTypes :+ convType): _*))
      .withColumn("__touch", when(col(typeCol) =!= convType,
        struct(col(tsNsCol).as("t_ts"), col(idCol).as("t_id"),
          col(typeCol).as("t_type"))))
      .withColumn("__last", last(col("__touch"), ignoreNulls = true).over(w))
    tagged.filter(col(typeCol) === convType)
      .withColumn("__ok", col("__last").isNotNull &&
        (col(tsNsCol) - col("__last.t_ts")) <= windowNs)
      .select(col(idCol).as("conv_id"), col(userCol).as("user"),
        col(tsNsCol).as("conv_ts"), col(valueCol).as("value"),
        when(col("__ok"), col("__last.t_type")).as("touch_type"),
        when(col("__ok"), col("__last.t_id")).as("touch_id"),
        when(col("__ok"), col("__last.t_ts")).as("touch_ts"))
  }
}
