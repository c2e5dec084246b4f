package graft

import graft.operators.{PageRank, RangeJoin}
import org.apache.spark.sql.functions._

/** PageRank + binned range join semantics. */
class GraphAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ PageRank
  test("pagerank: zero iterations is uniform; ranks sum to ~1 on symmetric graphs") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    val r0 = PageRank.run(edges, 0).as[(String, Double)].collect().toMap
    assert(r0.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
    val r5 = PageRank.run(edges, 5).as[(String, Double)].collect().toMap
    // symmetric connected graph: no dangling mass lost, total stays 1
    assert(math.abs(r5.values.sum - 1.0) < 1e-9)
    // b has degree 2, a and c degree 1: b must rank highest, a == c by symmetry
    assert(r5("b") > r5("a"))
    assert(math.abs(r5("a") - r5("c")) < 1e-12)
  }

  test("pagerank: star center dominates; dangling mass is dropped not redistributed") {
    val star = Seq("a", "b", "c", "d").flatMap(x => Seq((x, "hub"), ("hub", x)))
      .toDF("src", "dst")
    val r = PageRank.run(star, 10).as[(String, Double)].collect().toMap
    assert(r("hub") > r("a") * 2)
    // directed chain a->b: b never ranks (no out-edge => not a node), and a's
    // contribution leaves the node set — documented dangling contract
    val chain = Seq(("a", "b")).toDF("src", "dst")
    val rc = PageRank.run(chain, 2).as[(String, Double)].collect().toMap
    assert(rc.keySet == Set("a"))
    assert(math.abs(rc("a") - 0.15) < 1e-12) // n=1: (1-d)/1 + d*0 (b gives nothing back)
  }

  test("pagerank: GraphX backend (runBig) matches the DataFrame form") {
    // random directed graph WITH dangling dst-only nodes — the case where the
    // N-scaling argument has to hold exactly, not just for symmetric inputs
    val rnd = new scala.util.Random(41)
    val edges = (0 until 60).map { _ =>
      (s"v${rnd.nextInt(12)}", s"v${rnd.nextInt(16)}")
    }.distinct.filter { case (a, b) => a != b }.toDF("src", "dst")
    for (iters <- Seq(0, 1, 7)) {
      val df = PageRank.run(edges, iters).as[(String, Double)].collect().toMap
      val gx = PageRank.runBig(edges, iters).as[(String, Double)].collect().toMap
      assert(gx.keySet == df.keySet, s"iters=$iters")
      df.foreach { case (id, pr) =>
        assert(math.abs(gx(id) - pr) < 1e-9, s"iters=$iters id=$id: ${gx(id)} vs $pr")
      }
    }
    // the threshold dial routes run() itself through the GraphX backend
    val routed = PageRank.run(edges, 5, maxBroadcastNodes = 1L)
      .as[(String, Double)].collect().toMap
    val direct = PageRank.run(edges, 5).as[(String, Double)].collect().toMap
    routed.foreach { case (id, pr) => assert(math.abs(direct(id) - pr) < 1e-9) }
    // the handoff must not change the result schema: long ids stay long
    val longEdges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val viaBig = PageRank.run(longEdges, 3, maxBroadcastNodes = 1L)
    assert(viaBig.schema("id").dataType == org.apache.spark.sql.types.LongType)
    val viaDf = PageRank.run(longEdges, 3).as[(Long, Double)].collect().toMap
    viaBig.as[(Long, Double)].collect().foreach { case (id, pr) =>
      assert(math.abs(viaDf(id) - pr) < 1e-9, s"long-id id=$id")
    }
  }

  test("pagerank: cooccurrence edges are symmetric, distinct, reflexive-free") {
    val df = Seq((1, "x"), (1, "y"), (1, "y"), (2, "y"), (2, "z")).toDF("g", "item")
    val e = PageRank.cooccurrenceEdges(df, "g", "item")
      .as[(String, String)].collect().toSet
    assert(e == Set(("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")))
  }

  // ---------------------------------------------------------- binned range join
  private def rj(points: Seq[Long], intervals: Seq[(Int, Long, Long)], w: Long) = {
    val p = points.toDF("pt")
    val i = intervals.toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(p, i, "pt", "lo", "hi", w)
      .select("pt", "iid").as[(Long, Int)].collect().toSet
  }

  test("range join: half-open bounds, overlap, and multi-bin intervals") {
    val intervals = Seq((1, 0L, 10L), (2, 5L, 25L), (3, 30L, 31L))
    // pt=0 in [0,10); pt=10 excluded from 1 but not yet in anything; pt=5 in both 1 and 2
    assert(rj(Seq(0L, 5L, 9L, 10L, 24L, 25L, 30L), intervals, 4L) == Set(
      (0L, 1), (5L, 1), (5L, 2), (9L, 1), (9L, 2), (10L, 2), (24L, 2), (30L, 3)))
    // result must be bin-width invariant (the exact filter owns correctness)
    for (w <- Seq(1L, 3L, 7L, 100L))
      assert(rj(Seq(0L, 5L, 9L, 10L, 24L, 25L, 30L), intervals, w) ==
        rj(Seq(0L, 5L, 9L, 10L, 24L, 25L, 30L), intervals, 4L), s"binWidth=$w")
  }

  test("range join: negative domains and empty intervals") {
    val intervals = Seq((1, -10L, -2L), (2, -3L, 3L), (3, 5L, 5L))
    assert(rj(Seq(-10L, -3L, -2L, 0L, 2L, 3L, 5L), intervals, 4L) == Set(
      (-10L, 1), (-3L, 1), (-3L, 2), (-2L, 2), (0L, 2), (2L, 2)))
  }

  test("interval overlap join: exactly-once pairs across bin widths") {
    val a = Seq((1, 0L, 10L), (2, 8L, 12L), (3, 20L, 21L)).toDF("aid", "alo", "ahi")
    val b = Seq((10, 5L, 9L), (11, 11L, 30L), (12, 10L, 11L)).toDF("bid", "blo", "bhi")
    // ground truth by brute force: overlap iff alo < bhi && blo < ahi
    val want = (for {
      (ai, al, ah) <- Seq((1, 0L, 10L), (2, 8L, 12L), (3, 20L, 21L))
      (bi, bl, bh) <- Seq((10, 5L, 9L), (11, 11L, 30L), (12, 10L, 11L))
      if al < bh && bl < ah
    } yield (ai, bi)).toSet
    for (w <- Seq(1L, 3L, 8L, 64L)) {
      val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid").as[(Int, Int)].collect()
      assert(got.length == got.distinct.length, s"duplicates at binWidth=$w")
      assert(got.toSet == want, s"binWidth=$w: got ${got.toSet}")
    }
  }

  test("range join: epoch-nano magnitudes bin exactly (no float mis-binning)") {
    val base = 1770000000000000000L // ~2026 epoch nanos, > 2^53
    val w = 3600L * 1000 * 1000 * 1000
    // a point EXACTLY on an interval's lower bound, which is also a bin edge
    val lo = (base / w) * w
    assert(rj(Seq(lo, lo + w - 1, lo + w), Seq((1, lo, lo + w)), w) ==
      Set((lo, 1), (lo + w - 1, 1)))
  }

  test("personalized pagerank: mass localizes around the seed; decays with distance") {
    // symmetric path a-b-c-d-e, seed {a}: rank must strictly decay with
    // distance from the seed — the property global PageRank does NOT have
    // (it would rank interior nodes b,c,d above the endpoint a)
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("src", "dst")
    val seeds = Seq("a").toDF("id")
    val r = PageRank.personalized(path, seeds, iterations = 10)
      .as[(String, Double)].collect().toMap
    assert(r("a") > r("b") && r("b") > r("c") && r("c") > r("d") && r("d") > r("e"), r)
    val global = PageRank.run(path, 10).as[(String, Double)].collect().toMap
    assert(global("b") > global("a"), "precondition: global PR ranks interior over endpoint")
    // seeds without out-edges are ignored; zero surviving seeds must refuse
    val e = intercept[IllegalArgumentException] {
      PageRank.personalized(path, Seq("zz").toDF("id"), 2)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("pagerank block hygiene: only the final ranks checkpoint survives a run") {
    val sc = spark.sparkContext
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    for (f <- Seq(
        () => PageRank.run(edges, 4),
        () => PageRank.personalized(edges, Seq("a").toDF("id"), 4))) {
      val before = sc.getPersistentRDDs.keySet
      f().count()
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.size <= 1,
        s"pagerank left ${leaked.size} pinned RDDs (expected <= 1: final ranks)")
    }
  }

  test("k-core peel: cascading layers, surviving core, hygiene") {
    import graft.operators.KCore
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // triangle abc (2-core) + chain c-d-e hanging off it: e (deg 1) peels in
    // round 1, which drops d to deg 1 → round 2 — the cascade IS the layer
    val und = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
    val sym = und.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("src", "dst")
    val got = KCore.peelLayers(sym, k = 2, maxRounds = 10)
      .as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 0, "b" -> 0, "c" -> 0, "d" -> 2, "e" -> 1), got)
    // result-backing checkpoints only: survivors + one per non-empty round
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 3, s"kCore left ${leaked.size} pinned RDDs")
    org.apache.spark.sql.graft.Bridge.unpersistPlanCheckpoints(
      KCore.peelLayers(sym, k = 2, maxRounds = 10))
  }

  test("adamic-adar: scores match brute force, known edges excluded, hub cap prunes") {
    import graft.operators.LinkPrediction
    // square a-b-c-d-a (so (a,c) and (b,d) are the distance-2 non-edges)
    // plus hub h wired to everything: with the cap admitting h, (a,c) gets
    // 1/ln2 + 1/ln2 (via b, d) + 1/ln4 (via h); capping at 3 removes h's
    // wedge contributions entirely.
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"))
    val sym = und.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("src", "dst")
    def scores(cap: Int): Map[(String, String), (Long, Double)] =
      LinkPrediction.adamicAdar(sym, maxHubDegree = cap)
        .as[(String, String, Long, Double)].collect()
        .map { case (u, v, c, aa) => (u, v) -> (c, aa) }.toMap
    val full = scores(cap = 4)
    // deg: a,b,c,d = 3 (two square neighbors + h), h = 4
    val viaSquare = 1.0 / math.log(3)
    val viaHub = 1.0 / math.log(4)
    assert(full.keySet == Set(("a", "c"), ("b", "d")), full.keySet)
    val (cAC, aaAC) = full(("a", "c"))
    assert(cAC == 3L)
    assert(math.abs(aaAC - (2 * viaSquare + viaHub)) < 1e-12)
    // capping below deg(h) drops the hub-routed wedges, keeps the rest
    val capped = scores(cap = 3)
    assert(capped(("a", "c"))._1 == 2L)
    assert(math.abs(capped(("a", "c"))._2 - 2 * viaSquare) < 1e-12)
    // no predicted pair may be a known edge
    val known = und.map { case (u, v) => if (u < v) (u, v) else (v, u) }.toSet
    assert(full.keySet.intersect(known).isEmpty)
  }

  test("label propagation: bridged cliques stay separate communities; hygiene") {
    import graft.operators.LabelPropagation
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // two 4-cliques {a1..a4}, {b1..b4} joined by one bridge a4-b1: connected
    // components would merge everything; the mode keeps two communities
    // (each bridge endpoint hears 3 clique votes vs 1 bridge vote)
    val cliq = (g: String) => for {
      i <- 1 to 4; j <- 1 to 4 if i < j
    } yield (s"$g$i", s"$g$j")
    val und = cliq("a") ++ cliq("b") :+ ("a4", "b1")
    val sym = und.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("src", "dst")
    val got = LabelPropagation.run(sym, rounds = 4)
      .as[(String, String)].collect().toMap
    assert(got.keySet == (1 to 4).flatMap(i => Seq(s"a$i", s"b$i")).toSet)
    // min label wins inside each clique: all of a* -> a1, all of b* -> b1
    (1 to 4).foreach { i =>
      assert(got(s"a$i") == "a1", s"a$i -> ${got(s"a$i")}")
      assert(got(s"b$i") == "b1", s"b$i -> ${got(s"b$i")}")
    }
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"labelProp left ${leaked.size} pinned RDDs")
    org.apache.spark.sql.graft.Bridge.unpersistPlanCheckpoints(
      LabelPropagation.run(sym, rounds = 2))
  }

  test("cooccurrenceEdgesMinCount: distinct-group multiplicity, symmetric output") {
    // pair (p1,p2) in groups g1,g2 (and DUPLICATED within g1 — counts once);
    // (p1,p3) only in g1 — pruned at minGroups=2
    val df = Seq(
      ("g1", "p1"), ("g1", "p1"), ("g1", "p2"), ("g1", "p3"),
      ("g2", "p1"), ("g2", "p2")).toDF("g", "item")
    val got = PageRank.cooccurrenceEdgesMinCount(df, "g", "item", minGroups = 2)
      .as[(String, String)].collect().toSet
    assert(got == Set(("p1", "p2"), ("p2", "p1")), got)
  }

  // ----------------------------------------------------------------- Triangles
  test("triangles: K4 minus one edge; reversed/duplicate edges and loops fold") {
    import graft.operators.Triangles
    // K4 on {a,b,c,d} minus edge (c,d): triangles abc and abd remain.
    // a,b are in both (2 each); c,d in one; e-f edge is triangle-free.
    val edges = Seq(
      ("a", "b"), ("b", "a"),       // duplicate + reversed: one edge
      ("a", "c"), ("b", "c"),
      ("a", "d"), ("d", "b"),
      ("e", "f"), ("e", "e")        // no triangle; self-loop dropped
    ).toDF("x", "y")
    val got = Triangles.perNodeCounts(edges, "x", "y")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L), got)
  }

  test("triangles: hub skew — star graph has none, wheel rim closes them") {
    import graft.operators.Triangles
    val star = (1 to 20).map(i => ("hub", s"n$i")).toDF("x", "y")
    assert(Triangles.perNodeCounts(star, "x", "y").count() == 0)
    // close the rim into a cycle: every rim edge forms a triangle with hub
    val rim = (1 to 20).map(i => (s"n$i", s"n${i % 20 + 1}")).toDF("x", "y")
    val got = Triangles.perNodeCounts(star.union(rim), "x", "y")
      .as[(String, Long)].collect().toMap
    assert(got("hub") == 20L) // hub corners every rim triangle
    assert((1 to 20).forall(i => got(s"n$i") == 2L), got) // each rim node in 2
  }

  test("clustering coefficient: diagonal square + pendant — exact ratios, zeros surface") {
    import graft.operators.Triangles
    // square a-b-c-d-a with diagonal a-c, plus pendant d-e
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
      ("d", "e")).toDF("x", "y")
    val got = Triangles.clusteringCoefficient(edges, "x", "y")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3L, 2L, 2.0 / 3)))  // neighbors b,c,d; pairs bc, cd closed
    assert(got("b") == ((2L, 1L, 1.0)))
    assert(got("c") == ((3L, 2L, 2.0 / 3)))
    assert(got("d") == ((3L, 1L, 1.0 / 3)))  // neighbors a,c,e; only ac closed
    assert(got("e") == ((1L, 0L, 0.0)))      // degree-1: no pair, 0 by convention
  }

  test("weighted pagerank: equal weights ≡ unweighted bit-for-bit; heavy edge wins") {
    import graft.operators.PageRank
    val und = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val edges = und.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("src", "dst")
    // w/Σw with constant w=2 is exactly 1/outdeg (power-of-two scaling)
    val flat = PageRank.runWeighted(edges.withColumn("w", lit(2L)), iterations = 3)
      .as[(String, Double)].collect().toMap
    val plain = PageRank.run(edges, iterations = 3)
      .as[(String, Double)].collect().toMap
    assert(flat == plain, s"$flat vs $plain")
    // a routes 9/10 of its mass to b: b must outrank c even though c has
    // more (light) neighbors
    val w = Seq(("a", "b", 9L), ("b", "a", 9L), ("a", "c", 1L), ("c", "a", 1L),
      ("b", "c", 1L), ("c", "b", 1L), ("c", "d", 1L), ("d", "c", 1L))
      .toDF("src", "dst", "w")
    val ranks = PageRank.runWeighted(w, iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(ranks("b") > ranks("c"), ranks.toString)
  }

  test("egoFeatures: avg neighbor degree flags the hub's rim; agrees with coefficient") {
    import graft.operators.Triangles
    // star: hub degree 4, leaves degree 1 with avg neighbor degree 4
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"))
      .toDF("x", "y")
    val got = Triangles.egoFeatures(star, "x", "y")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("h") == (("h", 4L, 0L, 0.0, 1.0)))   // hub: all neighbors deg 1
    assert(got("l1") == (("l1", 1L, 0L, 0.0, 4.0))) // rim: one neighbor, the hub
    // triangle: everything symmetric, coeff 1, avg nbr deg 2
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("x", "y")
    val t = Triangles.egoFeatures(tri, "x", "y")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(t.forall(r => r._2 == 2L && r._3 == 1L && r._4 == 1.0 && r._5 == 2.0))
  }

  test("modularity: bridged triangles — hand-computed contribs; one-community split = 0") {
    import graft.operators.LabelPropagation
    // two triangles bridged by one edge: each community contrib =
    // 6/14 − (7/14)²; Q ≈ 0.357
    val und = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d"))
    val edges = und.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .toDF("src", "dst")
    val labels = Seq("a" -> "c1", "b" -> "c1", "c" -> "c1",
      "d" -> "c2", "e" -> "c2", "f" -> "c2").toDF("id", "label")
    val got = LabelPropagation.modularity(labels, edges)
      .as[(String, Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // exact rational: n_in·E − deg_sum² = 6·14 − 49 = 35 over E² = 196;
    // the double is derived FROM the rational (one division, not three ops)
    val exp = 35.0 / 196.0
    assert(got("c1") == (("c1", 3L, 6L, 7L, exp, 35L, 196L)), got("c1"))
    assert(got("c2") == (("c2", 3L, 6L, 7L, exp, 35L, 196L)))
    assert(got.values.forall(r => r._5 == r._6.toDouble / r._7.toDouble))
    // the degenerate one-community split scores exactly 0 (Ein = E, D = E)
    val one = labels.withColumn("label", lit("all"))
    val q = LabelPropagation.modularity(one, edges)
      .as[(String, Long, Long, Long, Double, Long, Long)].collect()
    assert(q.toSeq == Seq(("all", 6L, 14L, 14L, 0.0, 0L, 196L)), q.toSeq)
  }

  test("weighted modularity/conductance: heavy triangles, light bridge — hand-computed") {
    import graft.operators.LabelPropagation
    // the bridged-triangles graph, intra-triangle bonds weight 10, the
    // bridge weight 1: W = 2·(6·10 + 1) = 122 directed weight
    val und = Seq(("a", "b", 10L), ("b", "c", 10L), ("a", "c", 10L),
      ("d", "e", 10L), ("e", "f", 10L), ("d", "f", 10L), ("c", "d", 1L))
    val edges = und.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
      .toDF("src", "dst", "w")
    val labels = Seq("a" -> "c1", "b" -> "c1", "c" -> "c1",
      "d" -> "c2", "e" -> "c2", "f" -> "c2").toDF("id", "label")
    // per community: w_in = 6·10 = 60 directed, S = 60 + 1 bridge = 61;
    // contrib_num = 60·122 − 61² = 3599, den = 122² = 14884
    val m = LabelPropagation.modularityWeighted(labels, edges, "w")
      .as[(String, Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(m("c1") == (("c1", 3L, 60L, 61L, 3599.0 / 14884.0, 3599L, 14884L)), m("c1"))
    assert(m("c2") == (("c2", 3L, 60L, 61L, 3599.0 / 14884.0, 3599L, 14884L)))
    // weighted contrib (0.242) > unweighted (35/196 = 0.179): the light
    // bridge no longer dilutes the split — the operator's whole point
    assert(3599.0 / 14884.0 > 35.0 / 196.0)
    // conductance: vol = 61, cut = 1, min(61, 122−61) = 61 → φ = 1/61
    val c = LabelPropagation.conductanceWeighted(labels, edges, "w")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(c("c1") == (("c1", 3L, 61L, 1L, 1.0 / 61.0)), c("c1"))
    assert(c("c2") == (("c2", 3L, 61L, 1L, 1.0 / 61.0)))
    // weight-1 everywhere degenerates to the unweighted kernels exactly
    val ones = edges.withColumn("w", lit(1L))
    val uw = LabelPropagation.modularity(labels, ones).collect().toSet
    val ww = LabelPropagation.modularityWeighted(labels, ones, "w").collect().toSet
    assert(uw == ww)
  }

  // ------------------------------------------------------------------ HITS
  test("hits: star graph — center is the sole max on its side, max-normalized to 1") {
    import graft.operators.Hits
    // leaves point AT the hub: hub is the one authority, leaves are hubs
    val star = (1 to 10).map(i => (s"leaf$i", "center")).toDF("src", "dst")
    val r = Hits.run(star, iterations = 3)
      .as[(String, String, Double)].collect()
      .groupBy(_._1).map { case (role, rs) => role -> rs.map(t => t._2 -> t._3).toMap }
    assert(r("auth") == Map("center" -> 1.0))
    assert(r("hub").keySet == (1 to 10).map(i => s"leaf$i").toSet)
    assert(r("hub").values.forall(_ == 1.0)) // symmetric leaves all tie at max
  }

  test("hits: authority ranks by referrer quality, not raw in-degree") {
    import graft.operators.Hits
    // g is cited once by a strong hub (h cites 3 well-cited pages);
    // p is cited twice but only by weak hubs that cite nothing else popular.
    val edges = Seq(
      ("h", "a"), ("h", "b"), ("h", "g"),   // strong hub h
      ("w1", "p"), ("w2", "p"),             // weak hubs w1, w2
      ("h2", "a"), ("h2", "b")              // h2 reinforces a,b => h stays strong
    ).toDF("src", "dst")
    val auth = Hits.run(edges, iterations = 5)
      .filter(col("role") === "auth").select("id", "score")
      .as[(String, Double)].collect().toMap
    assert(auth("a") > auth("p") && auth("b") > auth("p"),
      s"well-referred pages must outrank raw-degree p: $auth")
    assert(auth("g") > 0.0 && auth.values.max == 1.0)
  }

  test("hits: scores are invariant to edge-list partitioning and duplicates-free input order") {
    import graft.operators.Hits
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (s"s${rnd.nextInt(15)}", s"d${rnd.nextInt(15)}"))
      .distinct.toDF("src", "dst")
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      Hits.run(df, iterations = 2)
        .select(col("role"), col("id"), round(col("score"), 9).as("s"))
        .as[(String, String, Double)].collect().toSet
    assert(norm(edges) == norm(edges.repartition(11).sortWithinPartitions("dst")))
  }

  test("hits: block hygiene — only the returned checkpoint is pinned; freeing it leaves nothing") {
    import graft.operators.Hits
    import org.apache.spark.sql.graft.Bridge
    val sc = spark.sparkContext
    val edges = (1 to 60).map(i => (s"s${i % 8}", s"d${i % 11}")).distinct.toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    for (_ <- 0 until 3) {
      val r = Hits.run(edges, iterations = 2)
      r.count()
      Bridge.unpersistCheckpoint(r) // the documented caller-must-free contract
    }
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"Hits.run leaked ${leaked.size} pinned RDDs beyond its result")
  }

  // ------------------------------------------------------------- random walks
  test("random walks: every hop follows an edge, one node per (walk, step), reproducible") {
    import graft.operators.RandomWalk
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("node")
    val run = () => RandomWalk.walks(edges, seeds, steps = 3)
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = run()
    // step 0 is the seed; 2 walks x 4 steps, exactly one node per (walk, step)
    assert(got.size == 8 && got.map(r => (r._1, r._2)).distinct.size == 8)
    assert(got.filter(_._2 == 0).map(r => (r._1, r._3)).toSet == Set((1L, 1L), (4L, 4L)))
    val edgeSet = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    for (w <- Seq(1L, 4L); s <- 1 to 3) {
      val cur = got.find(r => r._1 == w && r._2 == s).get._3
      val prev = got.find(r => r._1 == w && r._2 == s - 1).get._3
      assert(edgeSet((prev, cur)), s"walk $w step $s: ($prev,$cur) is not an edge")
    }
    assert(got == run(), "hash-argmin walks must be run-to-run identical")
  }

  test("random walks: a forced path is followed; dead ends terminate the walk early") {
    import graft.operators.RandomWalk
    // 1 -> 2 -> 3 is the only route (symmetric chain would allow backtracking;
    // directed here to force the path AND give 3 a dead end)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = RandomWalk.walks(edges, Seq(1L).toDF("node"), steps = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._2).toSeq
    // steps 0,1,2 exist; step 3 is dropped (node 3 has no out-edge)
    assert(got.map(r => (r._2, r._3)) == Seq((0, 1L), (1, 2L), (2, 3L)))
  }

  // ------------------------------------------------------ bounded-hop SSSP
  test("boundedSssp: two light hops beat one heavy edge; hop bound truncates") {
    import graft.operators.ShortestPaths
    // 1 -(5.0)- 3 direct, but 1 -(1.0)- 2 -(1.0)- 3 is lighter; 4 is 3 hops out
    val pairs = Seq((1L, 3L, 5.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))
    val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    val d2 = ShortestPaths.boundedSssp(edges, Seq(1L).toDF("node"), hops = 2)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(d2 == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 6.0))
    // within 2 hops node 4's best is via the heavy edge (5+1); hop 3 finds 3.0
    val d3 = ShortestPaths.boundedSssp(edges, Seq(1L).toDF("node"), hops = 3)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(d3(4L) == 3.0)
  }
}
