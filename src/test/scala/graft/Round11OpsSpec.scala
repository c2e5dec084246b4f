package graft

import graft.eval.Recall
import org.apache.spark.sql.functions._

/** Unit semantics for the round-11 additions (the Round10OpsSpec pattern):
  * hand-checked small cases per operator, independent of the DuckDB gate. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("m10 calibrationBins: perfect calibration flattens, clamping catches edges") {
    // scores 0.05/0.15/.../0.95, label = deterministic per construction:
    // bin b holds 10 rows of score b/10 + 0.05 with exactly b positives —
    // pos_rate = b/10, avg_score = b/10 + 0.05, so |gap| = 0.05 everywhere
    val rows = for {
      b <- 0 until 10; i <- 0 until 10
    } yield (b / 10.0 + 0.05, if (i < b) 1 else 0)
    val got = Recall.calibrationBins(rows.toDF("s", "y"), "s", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == (0L to 9L).toSet)
    (0 until 10).foreach { b =>
      val (n, np, avg, rate) = got(b.toLong)
      assert(n == 10L && np == b.toLong, s"bin $b")
      assert(math.abs(avg - (b / 10.0 + 0.05)) < 1e-9)
      assert(math.abs(rate - b / 10.0) < 1e-12)
    }
    // edge clamping: 1.0 joins the top bin, negative scores the bottom one
    val edge = Seq((1.0, 1), (1.0, 1), (-0.2, 0)).toDF("s", "y")
    val e = Recall.calibrationBins(edge, "s", "y", bins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == Map(9L -> 2L, 0L -> 1L), e)
  }

  test("sim5 labelPrototypes: centroid is the mean, medoid is the nearest member") {
    import graft.operators.VectorSearch
    // label A: three vectors around (1, 0); mean = (0.9, 0.1); "a2" at
    // (0.9, 0.1) IS the mean direction — medoid by construction.
    // label B: two symmetric vectors; tie on cosine -> id tiebreak picks b1.
    val rows = Seq(
      ("a1", "A", Array(1.0f, 0.0f)),
      ("a2", "A", Array(0.9f, 0.1f)),
      ("a3", "A", Array(0.8f, 0.2f)),
      ("b1", "B", Array(0.0f, 1.0f)),
      ("b2", "B", Array(1.0f, 0.0f)),
      ("nn", null.asInstanceOf[String], Array(9.0f, 9.0f))).toDF("id", "lab", "v")
    val got = VectorSearch.labelPrototypes(rows, "id", "v", "lab")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getString(2), r.getDouble(3), r.getSeq[Double](4)))).toMap
    assert(got.keySet == Set("A", "B")) // null label excluded
    val (nA, medA, cosA, centA) = got("A")
    assert(nA == 3L && medA == "a2")
    assert(centA.zip(Seq(0.9, 0.1)).forall { case (a, b) => math.abs(a - b) < 1e-7 })
    assert(cosA > 0.999)
    // B's centroid (0.5, 0.5) is equidistant from both members: id tiebreak
    val (nB, medB, _, centB) = got("B")
    assert(nB == 2L && medB == "b1", got("B"))
    assert(centB.zip(Seq(0.5, 0.5)).forall { case (a, b) => math.abs(a - b) < 1e-7 })
  }

  test("g27 trussPeel: K4 survives 4-truss, pendant and bridge peel in cascade") {
    import graft.operators.Triangles
    // K4 on {1,2,3,4}: every edge closes 2 triangles -> survives k=4.
    // 4–5 attaches triangle {4,5,6} via two bridges: edges of that triangle
    // close exactly 1 triangle -> removed round 1; pendant 6–7 closes 0.
    val und = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (4, 6), (5, 6), (6, 7))
    val edges = und.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    val got = Triangles.trussPeel(edges, "src", "dst", k = 4, rounds = 3)
      .as[(Long, Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size == 10) // every input edge accounted for
    // K4 edges: layer 0 with support 2 (computed on the final K4-only set)
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).foreach { e =>
      assert(got(e) == ((0, 2L)), s"$e -> ${got(e)}")
    }
    // the {4,5,6} triangle closes 1 triangle per edge -> peeled round 1
    Seq((4L, 5L), (4L, 6L), (5L, 6L)).foreach { e =>
      assert(got(e) == ((1, 1L)), s"$e -> ${got(e)}")
    }
    // pendant edge closes nothing
    assert(got((6L, 7L)) == ((1, 0L)))
    // k=3 keeps every triangle edge: only the pendant peels
    val k3 = Triangles.trussPeel(edges, "src", "dst", k = 3, rounds = 3)
      .as[(Long, Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(k3((6L, 7L)) == 1)
    assert(k3.count(_._2 == 0) == 9, k3)
  }

  test("cs9 zipfFit: exact power law fits slope -1 with r2 = 1; uniform is degenerate") {
    import graft.operators.CorpusOps
    // counts EXACTLY c(rank) = 720/rank for ranks 1..6 -> ln-ln is a
    // perfect line of slope -1 through (0, ln 720)
    val rows = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"t$r")).toDF("term")
    val got = CorpusOps.zipfFit(rows, "term").collect().head
    assert(got.getLong(0) == 6L)
    assert(math.abs(got.getDouble(1) - (-1.0)) < 1e-9, got)
    assert(math.abs(got.getDouble(2) - math.log(720.0)) < 1e-9)
    assert(math.abs(got.getDouble(3) - 1.0) < 1e-9)
    // a single term has zero rank variance: slope/intercept/r2 all NULL
    val one = CorpusOps.zipfFit(Seq("a", "a", "a").toDF("term"), "term").collect().head
    assert(one.getLong(0) == 1L && one.isNullAt(1) && one.isNullAt(2) && one.isNullAt(3))
    // uniform counts: slope exists (0) but y-variance is 0 -> r2 NULL
    val uni = CorpusOps.zipfFit(Seq("a", "b", "c").toDF("term"), "term").collect().head
    assert(math.abs(uni.getDouble(1)) < 1e-12 && uni.isNullAt(3), uni)
  }

  test("sim6 mutualKnn: one-directional outlier edges drop, tight pairs survive") {
    import graft.operators.VectorSearch
    // a/b form a tight pair; o's nearest is a, but a's top-1 is b (and
    // vice versa), so o's edge is one-directional and must NOT appear
    val rows = Seq(
      ("a", Array(1.0f, 0.0f)),
      ("b", Array(0.99f, 0.14f)),
      ("o", Array(0.7f, 0.7f))).toDF("id", "v")
    val k1 = VectorSearch.mutualKnn(rows, "id", "v", k = 1)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(k1 == Set(("a", "b")), k1)
    // k=2: every directed list contains both others -> all 3 pairs mutual
    val k2 = VectorSearch.mutualKnn(rows, "id", "v", k = 2)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(k2 == Set(("a", "b"), ("a", "o"), ("b", "o")), k2)
  }

  test("m11 rougeN: clipped counting, hand-checked bigrams, empty sides NULL") {
    // cand "a b a b" vs ref "a b c a b": cand bigrams {ab:2, ba:1};
    // ref bigrams {ab:2, bc:1, ca:1}; clipped overlap = min(2,2) = 2.
    // precision 2/3, recall 2/4.
    val df = Seq(
      (1L, "a b a b", "a b c a b"),
      (2L, "", "a b c"),          // no cand grams -> precision NULL
      (3L, "x y", "z w")          // disjoint -> overlap 0, f1 NULL (p+r=0)
    ).toDF("id", "cand", "ref")
    val got = Recall.rougeN(df, "id", "cand", "ref", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((3L, 4L, 2L)), r1)
    assert(math.abs(r1.getDouble(4) - 2.0 / 3) < 1e-12)
    assert(r1.getDouble(5) == 0.5)
    // f1 = 2pr/(p+r) = 2*(2/3)*(1/2)/(2/3+1/2) = (2/3)/(7/6) = 4/7
    assert(math.abs(r1.getDouble(6) - 4.0 / 7) < 1e-12)
    val r2 = got(2L)
    assert(r2.getLong(1) == 0L && r2.isNullAt(4) && !r2.isNullAt(5))
    assert(r2.getDouble(5) == 0.0) // recall defined: 0 of 2 ref grams found
    val r3 = got(3L)
    assert(r3.getLong(3) == 0L && r3.getDouble(4) == 0.0 && r3.isNullAt(6))
  }

  test("sim7 tripletMine: hardest positive is the farthest in-class, margin signs") {
    import graft.operators.VectorSearch
    // class A spans a 45-degree arc (a1 at 0 deg, a2 at 20, a3 at 45);
    // class B sits at 80/90. For anchor a1: hardest positive = a3
    // (farthest in class), hardest negative = b2 (cos 80 beats cos 90).
    // Singleton class C drops (no positive corner).
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val rows = Seq(
      ("a1", "A", v(0)), ("a2", "A", v(20)), ("a3", "A", v(45)),
      ("b1", "B", v(90)), ("b2", "B", v(80)),
      ("c1", "C", v(180))).toDF("id", "lab", "vec")
    val got = VectorSearch.tripletMine(rows, "id", "vec", "lab")
      .collect().map(r => r.getString(0) ->
        (r.getString(2), r.getString(4), r.getDouble(6))).toMap
    assert(!got.contains("c1")) // singleton class: no positive corner
    val (p1, n1, m1) = got("a1")
    assert(p1 == "a3" && n1 == "b2", got("a1"))
    // pos_cos = cos45 (~0.707) > neg_cos = cos80 (~0.174) -> positive margin
    assert(m1 > 0)
    // b1's hardest negative is c1 (cos(90->180) = cos 90... actually
    // farthest cross-label is NOT mined; hardest = HIGHEST cosine: a3 at
    // 45 deg is cos(45) from b1, c1 is cos(90) -> a3 wins
    assert(got("b1")._2 == "a3", got("b1"))
    // c1 never appears: it is orthogonal-or-worse to every other vector,
    // but as an anchor it lacks a positive; as a negative it loses to
    // closer cross-label vectors for every anchor here
    assert(got.values.forall(_._2 != "c1"))
  }

  test("sim8 knnDensity: the planted outlier scores the lowest mean cosine") {
    import graft.operators.VectorSearch
    // tight cluster near (1, 0); "out" is orthogonal — its k_eff stays 2
    // but its mean cosine collapses toward 0 while cluster members stay ~1
    val rows = Seq(
      ("a", Array(1.0f, 0.0f)), ("b", Array(0.99f, 0.05f)),
      ("c", Array(0.98f, 0.1f)), ("out", Array(0.0f, 1.0f))).toDF("id", "v")
    val got = VectorSearch.knnDensity(rows, "id", "v", k = 2)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.values.forall(_._1 == 2L)) // k_eff = 2 everywhere (4 vectors)
    assert(got("out")._2 < 0.11, got("out")) // cos(out, c) ~ 0.1 is its best
    Seq("a", "b", "c").foreach(id => assert(got(id)._2 > 0.99, s"$id ${got(id)}"))
    assert(got.minBy(_._2._2)._1 == "out")
  }

  test("g28 harmonic counts: path graph hand-check via the SSSP kernel") {
    import graft.operators.ShortestPaths
    // path 1-2-3-4-5, seed 1: d=1 to {2}, d=2 to {3}, d=3 to {4}; 5 is
    // beyond 3 hops -> H = 1 + 1/2 + 1/3 = 11/6
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b, 1.0), (b, a, 1.0)) }
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val d = ShortestPaths.boundedSssp(edges, seeds, hops = 3)
      .filter(col("d") > 0).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(d == Map(2L -> 1.0, 3L -> 2.0, 4L -> 3.0), d)
    val h = d.values.map(1.0 / _).sum
    assert(math.abs(h - 11.0 / 6) < 1e-12)
  }
}
