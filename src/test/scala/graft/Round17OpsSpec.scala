package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-17 changes: the lazily-selected (zero driver
  * jobs) KLL level selection now shared by single-group and grouped paths,
  * the NULL contracts on QuantileSketch entry points, and the StateTable
  * batchId replay guard for checkpoint-restart re-deliveries. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  test("KLL build/merge/read construction runs ZERO driver jobs (lazy SQL level selection)") {
    import graft.operators.QuantileSketch
    val df = (1L to 500L).map(i => (i, (i * 37) % 211)).toDF("id", "v")
    val df2 = (501L to 900L).map(i => (i, (i * 13) % 211)).toDF("id", "v")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val q = QuantileSketch.quantilesFromSketch(
        QuantileSketch.merge(
          QuantileSketch.build(df, "v", "id", cap = 64),
          QuantileSketch.build(df2, "v", "id", cap = 64), cap = 64),
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
