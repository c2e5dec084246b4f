package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-16 additions: the md5-derandomized KLL-style
  * quantile sketch (hand-checked small cases, cap bound, merge == one-shot,
  * measured rank error) and the removable counting-Bloom membership sketch. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("QuantileSketch: input under cap keeps everything at level 0 and reads exact quantiles") {
    import graft.operators.QuantileSketch
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val sk = QuantileSketch.build(df, "v", "id", cap = 200)
    assert(sk.count() == 100)
    assert(sk.select("_level").head().getInt(0) == 0)
    // with every item kept, the rank read IS the exact quantile:
    // est(q) = value at rank ceil(q·100/100) = q
    val est = QuantileSketch.quantilesFromSketch(sk, Seq(10, 50, 90))
      .select("q_pct", "est").as[(Long, Long)].collect().toMap
    assert(est == Map(10L -> 10L, 50L -> 50L, 90L -> 90L))
  }

  test("QuantileSketch: cap forces a positive level, cap bound holds, estimates stay near-exact") {
    import graft.operators.QuantileSketch
    val n = 4000L
    val df = (1L to n).map(i => (i, i)).toDF("id", "v")
    val sk = QuantileSketch.build(df, "v", "id", cap = 128)
    val level = sk.select("_level").head().getInt(0)
    assert(level > 0, "4000 items at cap=128 must compact")
    assert(sk.count() <= 128)
    // uniform values 1..n: the estimate at q should sit within a few
    // sampling standard deviations (~n/sqrt(m)) of q·n/100
    val m = sk.count().toDouble
    val tol = 4.0 * n / math.sqrt(m)
    val est = QuantileSketch.quantilesFromSketch(sk, Seq(25, 50, 75))
      .select("q_pct", "est").as[(Long, Long)].collect()
    est.foreach { case (q, e) =>
      assert(math.abs(e - q * n / 100.0) < tol,
        s"q=$q est=$e expected ~${q * n / 100} (tol $tol, m=$m)") }
  }

  test("QuantileSketch.merge == one-shot build, bit-equal, and floor is respected") {
    import graft.operators.QuantileSketch
    val a = (0L until 1500L).map(i => (i, (i * 31) % 997)).toDF("id", "v")
    val b = (1500L until 2600L).map(i => (i, (i * 17) % 997)).toDF("id", "v")
    val cap = 64
    val merged = QuantileSketch.merge(
      QuantileSketch.build(a, "v", "id", cap),
      QuantileSketch.build(b, "v", "id", cap), cap)
    val oneShot = QuantileSketch.build(a.unionByName(b), "v", "id", cap)
    val ms = merged.as[(Long, String, Long, Int, Int)].collect().toSet
    val os = oneShot.as[(Long, String, Long, Int, Int)].collect().toSet
    assert(ms == os && ms.nonEmpty)
    // and the merged level never fell below either side's (the monotone
    // count argument the bit-equality proof rests on)
    val la = QuantileSketch.build(a, "v", "id", cap).select("_level").head().getInt(0)
    val lb = QuantileSketch.build(b, "v", "id", cap).select("_level").head().getInt(0)
    assert(ms.head._5 >= math.max(la, lb))
  }

  test("QuantileSketch.quantilesByGroup == per-group single-group quantiles") {
    import graft.operators.QuantileSketch
    // three groups of very different sizes so levels differ per group
    val df = ((1L to 2000L).map(i => ("big", i, i)) ++
      (1L to 90L).map(i => ("mid", 3000L + i, i * 10)) ++
      (1L to 5L).map(i => ("tiny", 5000L + i, i * 100)))
      .toDF("g", "id", "v")
    val cap = 64
    val grouped = QuantileSketch.quantilesByGroup(df, Seq("g"), "v", "id",
        cap, qPcts = Seq(25, 50, 75, 90))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // the distributed per-group level/rank must equal running the driver-
    // collected single-group path on each group separately
    val single = Seq("big", "mid", "tiny").flatMap { g =>
      QuantileSketch.quantiles(df.filter($"g" === g), "v", "id", cap,
          qPcts = Seq(25, 50, 75, 90))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (q, e, l, m) => (g, q, e, l, m) }
    }.toSet
    assert(grouped == single && grouped.nonEmpty)
    // sanity: big compacts (level > 0), tiny keeps everything (level 0)
    assert(grouped.find(_._1 == "big").get._4 > 0)
    assert(grouped.find(_._1 == "tiny").get._4 == 0)
  }

  test("CountingBloom: maintain from a delta == rebuild from the survivors, bit-equal") {
    import graft.operators.CountingBloom
    val m = 1 << 10
    val v1 = (0L until 400L).toDF("k")
    val added = (400L until 450L).toDF("k")
    val removed = (0L until 400L by 7L).toDF("k")
    val v2 = (0L until 450L).filter(i => i >= 400 || i % 7 != 0).toDF("k")
    val maintained = CountingBloom.maintain(
      CountingBloom.counters(v1, "k", m), added, removed, "k")
      .select("pos", "cnt").as[(Int, Long)].collect().toMap
    val rebuilt = CountingBloom.counters(v2, "k", m)
      .select("pos", "cnt").as[(Int, Long)].collect().toMap
    assert(maintained == rebuilt && maintained.nonEmpty)
    // counter mass invariant: every key contributes exactly h positions
    assert(maintained.values.sum == 5L * v2.count())
    // the state's own marker drives maintenance — a delta with a DIFFERENT
    // key dtype than the build must fail loudly, not false-negative silently
    val e = intercept[IllegalArgumentException] {
      CountingBloom.maintain(CountingBloom.counters(v1, "k", m),
        Seq(1, 2).toDF("k"), Seq.empty[Int].toDF("k"), "k")
    }
    assert(e.getMessage.contains("dtype"))
  }

  test("CountingBloom: no false negatives; removal actually forgets; fpp is sane") {
    import graft.operators.CountingBloom
    val m = 1 << 12
    val present = (0L until 300L).toDF("k")
    val state = CountingBloom.maintain(
      CountingBloom.counters((0L until 500L).toDF("k"), "k", m),
      spark.emptyDataset[Long].toDF("k"), (300L until 500L).toDF("k"), "k")
    val bits = CountingBloom.bitset(state)
    // every surviving key passes (false negatives impossible under discipline)
    assert(present.filter(!CountingBloom.mightContain(bits, col("k"))).isEmpty)
    // probes over a disjoint range pass only at the false-positive rate —
    // and removal must have FORGOTTEN most of the removed range's bits:
    // a plain Bloom would still pass all 200 removed keys
    val fpProbe = (10000L until 12000L).toDF("k")
    val fpRate = fpProbe.filter(CountingBloom.mightContain(bits, col("k"))).count() / 2000.0
    assert(fpRate < 0.25, s"fpp $fpRate out of range for n=300, m=$m")
    val removedPass = (300L until 500L).toDF("k")
      .filter(CountingBloom.mightContain(bits, col("k"))).count()
    assert(removedPass < 100, s"removal did not forget: $removedPass/200 still pass")
  }

  test("CountingBloom.antiJoin == plain left-anti after removals (the x20 shape that forgets)") {
    import graft.operators.CountingBloom
    val m = 1 << 12
    // eval set v1 = 0..199, then 100..199 removed: surviving eval = 0..99
    val evalNow = (0L until 100L).toDF("k")
    val state = CountingBloom.maintain(
      CountingBloom.counters((0L until 200L).toDF("k"), "k", m),
      spark.emptyDataset[Long].toDF("k"), (100L until 200L).toDF("k"), "k")
    val corpus = (50L until 350L).map(i => (i, s"doc$i")).toDF("k", "body")
    val got = CountingBloom.antiJoin(corpus, "k", state, evalNow, "k")
    val want = corpus.join(evalNow, Seq("k"), "left_anti")
    assert(got.count() == 300 - 50 && // 50..99 contaminated, rest clean
      got.select("k").except(want.select("k")).isEmpty &&
      want.select("k").except(got.select("k")).isEmpty)
    // and the forgetting matters: keys 100..199 (removed from eval) must
    // NOT be dropped from the corpus — a stale non-removable sketch plus a
    // stale truth table would have cut them
    assert(got.filter($"k" >= 100 && $"k" < 200).count() == 100)
  }

  test("CountingBloom: undisciplined remove fails loudly; chooseMaintain crossover") {
    import graft.operators.CountingBloom
    val m = 1 << 10
    val state = CountingBloom.maintain(
      CountingBloom.counters((0L until 10L).toDF("k"), "k", m),
      spark.emptyDataset[Long].toDF("k"),
      (100L until 140L).toDF("k"), "k") // never-added keys
    val e = intercept[IllegalArgumentException] { CountingBloom.bitset(state) }
    assert(e.getMessage.contains("negative counter"))
    assert(CountingBloom.chooseMaintain(10, 100) && !CountingBloom.chooseMaintain(60, 100))
    assert(!CountingBloom.chooseMaintain(1, 0)) // empty new corpus: rebuild is free
  }

  test("CountingBloom probe plan: codegen'd bitset_get, no ScalaUDF") {
    import graft.operators.CountingBloom
    val probe = spark.read.parquet(sf("documents")).select(col("doc_id"))
    val state = CountingBloom.counters(probe, "doc_id", 1 << 12)
    val plan = CountingBloom.semiJoin(probe, "doc_id", state, probe, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bitset_get"), "native bitset probe missing\n" + plan)
    assert(!plan.contains("ScalaUDF"), "boxed UDF in probe path\n" + plan)
  }

  test("QuantileSketch.rankError: measured error is small and zero when nothing compacts") {
    import graft.operators.QuantileSketch
    val df = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    // no compaction -> exact rank reads -> error < 1/n in ppm terms
    val exact = QuantileSketch.rankError(df, "v",
      QuantileSketch.quantiles(df, "v", "id", cap = 1000, qPcts = Seq(50)))
      .select("rank_err_ppm").as[Long].head()
    assert(exact <= 1000000 / 500)
    // compacted at cap=64: sampling error, bounded well under total drift
    val rough = QuantileSketch.rankError(df, "v",
      QuantileSketch.quantiles(df, "v", "id", cap = 64, qPcts = Seq(50)))
      .select("rank_err_ppm").as[Long].head()
    assert(rough < 300000, s"rank error suspiciously large: $rough ppm")
  }
}
