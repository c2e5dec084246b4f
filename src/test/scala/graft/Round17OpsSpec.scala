package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-17 changes: the lazily-selected (zero driver
  * jobs) KLL level selection now shared by single-group and grouped paths,
  * the NULL contracts on QuantileSketch entry points, and the StateTable
  * batchId replay guard for checkpoint-restart re-deliveries. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  test("KLL merge/read construction runs ZERO driver jobs (lazy SQL level selection)") {
    import graft.operators.QuantileSketch
    // the streaming per-batch shape (kllMaintain): saved state merged with a
    // freshly leveled batch — the r17 contract this pin protects is that
    // CONSTRUCTING that merge runs no driver jobs per micro-batch (the r16
    // path collected a 33-row histogram + two head() actions here). build()
    // itself is deliberately EAGER since r19 (one md5 pass instead of two —
    // three bounded actions at construction); the streaming path never
    // calls it, so the per-batch laziness contract is unchanged.
    val df = (1L to 500L).map(i => (i, (i * 37) % 211)).toDF("id", "v")
    val df2 = (501L to 900L).map(i => (i, (i * 13) % 211)).toDF("id", "v")
    val state = QuantileSketch.build(df, "v", "id", cap = 64)
      .localCheckpoint(true) // the StateTable stand-in, materialized up front
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val fresh = QuantileSketch.leveled(df2, "v", "id")
        .withColumn("_level", org.apache.spark.sql.functions.lit(0))
      val q = QuantileSketch.quantilesFromSketch(
        QuantileSketch.merge(state, fresh, cap = 64),
        Seq(25, 50, 75))
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext)
      assert(jobs.get() == 0,
        s"plan CONSTRUCTION ran ${jobs.get()} driver jobs — the r16 path " +
          "collected a 33-row histogram + two head() actions here")
      assert(q.count() == 3) // acting on the plan is where the jobs belong
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("single-group build/merge via the shared selection stay bit-equal to the r16 semantics") {
    import graft.operators.QuantileSketch
    // the r16 selection contract, restated: smallest level whose survivor
    // count fits cap; merged level >= each side's; merge == one-shot.
    // (Round16OpsSpec + KllPropertySpec re-verify the full property; this
    // pins the level VALUE against a hand-computed suffix count.)
    val df = (1L to 4000L).map(i => (i, i)).toDF("id", "v")
    val sk = QuantileSketch.build(df, "v", "id", cap = 128)
    val lv = QuantileSketch.leveled(df, "v", "id")
    val byHand = (0 to 33).map(l =>
      l -> lv.filter(col("_tz") >= l).count()).find(_._2 <= 128).get._1
    assert(sk.select("_level").head().getInt(0) == byHand)
    assert(sk.count() == lv.filter(col("_tz") >= byHand).count())
  }

  test("buildByGroup excludes NULL group keys by contract (r17 advice)") {
    import graft.operators.QuantileSketch
    val df = Seq((Option("a"), 1L, 1L), (Option.empty[String], 2L, 2L),
      (Option("b"), 3L, 3L), (Option("a"), 4L, 4L))
      .toDF("g", "v", "id")
    val out = QuantileSketch.quantilesByGroup(df, Seq("g"), "v", "id",
      cap = 8, qPcts = Seq(50))
    assert(out.select("g").as[String].collect().toSet == Set("a", "b"))
  }

  test("leveled/build exclude NULL value and NULL id rows (guard, not behavior change)") {
    import graft.operators.QuantileSketch
    val df = Seq((Option(1L), Option(1L)), (Option.empty[Long], Option(2L)),
      (Option(3L), Option.empty[Long]), (Option(4L), Option(4L)))
      .toDF("v", "id")
    val sk = QuantileSketch.build(df, "v", "id", cap = 8)
    assert(sk.count() == 2)
    assert(sk.select("_v").as[Long].collect().toSet == Set(1L, 4L))
  }

  // ---------------- cs13: the equal-weight collapse compactor ----------------

  test("compactSketch: input under cap keeps everything at stride 1 and reads exact quantiles") {
    import graft.operators.QuantileSketch
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val sk = QuantileSketch.compactSketch(df, "v", "id", cap = 200)
    assert(sk.count() == 100)
    assert(sk.select("_s").head().getLong(0) == 1L)
    assert(sk.agg(sum($"_w")).head().getLong(0) == 100L) // weights sum to n
    val est = QuantileSketch.quantilesFromCompact(sk, Seq(10, 50, 90))
      .select("q_pct", "est").as[(Long, Long)].collect().toMap
    assert(est == Map(10L -> 10L, 50L -> 50L, 90L -> 90L))
  }

  test("compactSketch: DETERMINISTIC stride/2 error bound, cap bound, partition purity") {
    import graft.operators.QuantileSketch
    val n = 4000L
    val df = (1L to n).map(i => (i, i)).toDF("id", "v")
    val sk = QuantileSketch.compactSketch(df, "v", "id", cap = 128)
    val stride = sk.select("_s").head().getLong(0)
    assert(stride == 32L) // ceil(4000/128)
    assert(sk.count() <= 128)
    assert(sk.agg(sum($"_w")).head().getLong(0) == n)
    // values 1..n distinct => rank(v) = v-1; the read's guaranteed bound is
    // stride/2 for interior quantiles — not a concentration bound, a cert
    val est = QuantileSketch.quantilesFromCompact(sk, Seq(1, 5, 25, 50, 75, 95, 99))
      .select("q_pct", "est").as[(Long, Long)].collect()
    est.foreach { case (q, e) =>
      val target = math.max(1L, (q * n + 99) / 100)
      assert(math.abs(e - target) <= stride / 2,
        s"q=$q est=$e target=$target exceeded the stride/2=${stride / 2} bound") }
    // purity: the sketch is a pure function of the multiset, any partitioning
    val sk2 = QuantileSketch.compactSketch(df.repartition(7), "v", "id", cap = 128)
    assert(sk.collect().toSet == sk2.collect().toSet)
  }

  test("mergeCompact: a union that fits cap is kept lossless; a big merge is deterministic and bounded") {
    import graft.operators.QuantileSketch
    val a = (1L to 30L).map(i => (i, i * 2 - 1)).toDF("id", "v") // odd values
    val b = (31L to 60L).map(i => (i, (i - 30) * 2)).toDF("id", "v") // even values
    val small = QuantileSketch.mergeCompact(
      QuantileSketch.compactSketch(a, "v", "id", cap = 64),
      QuantileSketch.compactSketch(b, "v", "id", cap = 64), cap = 64)
    assert(small.count() == 60) // no resample: every survivor kept
    assert(small.agg(sum($"_w")).head().getLong(0) == 60L)
    assert(small.select("_v").as[Long].collect().toSet == (1L to 60L).toSet)
    // big merge: two 2000-item halves at cap 128 (stride 16 each) resample
    // onto the 4000-mass grid (stride 32); error <= sA/2 + sB/2 + s'/2 + s'/2
    val n = 4000L
    val c = (1L to n / 2).map(i => (i, i)).toDF("id", "v")
    val d = (n / 2 + 1 to n).map(i => (i, i)).toDF("id", "v")
    val sc = QuantileSketch.compactSketch(c, "v", "id", cap = 128)
    val sd = QuantileSketch.compactSketch(d, "v", "id", cap = 128)
    val m1 = QuantileSketch.mergeCompact(sc, sd, cap = 128)
    val m2 = QuantileSketch.mergeCompact(sc, sd, cap = 128)
    assert(m1.collect().toSet == m2.collect().toSet) // deterministic
    assert(m1.count() <= 128)
    assert(m1.agg(sum($"_w")).head().getLong(0) == n)
    val est = QuantileSketch.quantilesFromCompact(m1, Seq(25, 50, 75))
      .select("q_pct", "est").as[(Long, Long)].collect()
    est.foreach { case (q, e) =>
      val target = math.max(1L, (q * n + 99) / 100)
      assert(math.abs(e - target) <= 8 + 8 + 32,
        s"merged read q=$q est=$e target=$target outside the additive bound") }
  }

  test("compactSketchByGroup: per-group stride/2 bound, cap bound, grouped == single per group") {
    import graft.operators.QuantileSketch
    val df = (1L to 3000L).map(i => (if (i % 3 == 0) "a" else "b", i, i))
      .toDF("g", "id", "v")
    val sk = QuantileSketch.compactSketchByGroup(df, Seq("g"), "v", "id", cap = 32)
    // per-group cap + mass conservation
    val byG = sk.groupBy("g").agg(count(lit(1)).as("m"), sum($"_w").as("w"))
      .as[(String, Long, Long)].collect()
      .map { case (g, m, w) => g -> (m, w) }.toMap
    assert(byG("a")._1 <= 32 && byG("b")._1 <= 32)
    assert(byG("a")._2 == 1000L && byG("b")._2 == 2000L)
    // the read honors each group's own deterministic bound
    val est = QuantileSketch.quantilesFromCompactByGroup(sk, Seq("g"), Seq(25, 50, 75))
      .select("g", "q_pct", "est").as[(String, Long, Long)].collect()
    est.foreach { case (g, q, e) =>
      // group "a" = multiples of 3 (1000 values), "b" = the rest (2000)
      val n = if (g == "a") 1000L else 2000L
      val stride = (n + 31) / 32
      val targetIdx = math.max(1L, (q * n + 99) / 100) // 1-indexed within group
      val target = if (g == "a") targetIdx * 3
        else { // k-th non-multiple-of-3 among 1..3000
          var k = targetIdx; var x = 0L
          while (k > 0) { x += 1; if (x % 3 != 0) k -= 1 }; x
        }
      // values within a group are ~uniform with step 1.5 (b) / 3 (a):
      // rank error <= stride/2 translates to value error <= step*stride/2
      val step = if (g == "a") 3.0 else 1.5
      assert(math.abs(e - target) <= step * stride / 2 + step,
        s"g=$g q=$q est=$e target=$target stride=$stride")
    }
  }

  test("StateTable batchId guard: a replayed batch is a no-op, the next applies") {
    import graft.streaming.StreamingOps.StateTable
    val dir = java.nio.file.Files.createTempDirectory("state_bid").toString + "/st"
    StateTable.appliedOnce(spark, dir, 0L) { Seq((1L, 10L)).toDF("k", "n") }
    assert(StateTable.lastBatchId(spark, dir).contains(0L))
    // checkpoint-restart replay: SAME batchId, (possibly) different rows —
    // must be skipped, or every additive state would double-count
    StateTable.appliedOnce(spark, dir, 0L) { Seq((1L, 99L)).toDF("k", "n") }
    assert(StateTable.read(spark, dir).get.select("n").head().getLong(0) == 10L)
    // the genuinely-next batch applies and advances the marker
    StateTable.appliedOnce(spark, dir, 1L) { Seq((1L, 20L)).toDF("k", "n") }
    assert(StateTable.read(spark, dir).get.select("n").head().getLong(0) == 20L)
    assert(StateTable.lastBatchId(spark, dir).contains(1L))
    // marker-less writes (pre-r17 states) stay readable, just unprotected
    StateTable.overwrite(Seq((1L, 30L)).toDF("k", "n"), dir)
    assert(StateTable.lastBatchId(spark, dir).isEmpty)
    assert(StateTable.read(spark, dir).get.select("n").head().getLong(0) == 30L)
  }
}
