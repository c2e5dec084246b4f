package graft

import graft.operators.{Dedup, VectorSearch}
import org.apache.spark.sql.functions._

/** Unit semantics for the round-12 additions: blocked contrastive-mining
  * variants (sim4b/sim6b/sim8b) and the empty-input safety of every
  * sign-block sketch call site. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters far apart: within-cluster cosines ≈ 1, cross ≈ 0.
  // With ANY sign sketch, near-identical vectors land in the same block, so
  // within-cluster edges must survive blocking.
  private lazy val clustered = Seq(
    ("a1", "A", Array(1.0f, 0.01f, 0.0f, 0.0f)),
    ("a2", "A", Array(1.0f, 0.02f, 0.0f, 0.0f)),
    ("a3", "B", Array(1.0f, 0.03f, 0.0f, 0.0f)),
    ("b1", "B", Array(0.0f, 0.0f, 1.0f, 0.01f)),
    ("b2", "B", Array(0.0f, 0.0f, 1.0f, 0.02f)),
    ("b3", "A", Array(0.0f, 0.0f, 1.0f, 0.03f))).toDF("id", "lab", "v")

  test("blocked labelAgreement: result is the exact audit restricted to blocks") {
    val exact = VectorSearch.labelAgreement(clustered, "id", "v", "lab", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val blocked = VectorSearch.labelAgreement(clustered, "id", "v", "lab", k = 5,
      blockBits = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // blocking can only REMOVE candidates: k_eff never grows
    blocked.foreach { case (id, kEff) =>
      assert(kEff <= exact(id), s"$id: blocked k_eff $kEff > exact ${exact(id)}")
    }
    // near-identical vectors share sign patterns: each anchor keeps its two
    // same-cluster neighbors
    assert(blocked.values.forall(_ >= 2), blocked)
  }

  test("blocked mutualKnn: edges are a subset of the exact graph; clusters survive") {
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getString(1))
    val exact = VectorSearch.mutualKnn(clustered, "id", "v", k = 3)
      .collect().map(key).toSet
    val blocked = VectorSearch.mutualKnn(clustered, "id", "v", k = 3, blockBits = 3)
      .collect().map(key).toSet
    assert(blocked.subsetOf(exact), s"blocked edges not ⊆ exact: ${blocked -- exact}")
    // the within-cluster mutual edges survive
    assert(blocked.contains(("a1", "a2")) && blocked.contains(("b1", "b2")), blocked)
  }

  test("blocked knnDensity: dense rows stay high; k_eff bounded by block size") {
    val blocked = VectorSearch.knnDensity(clustered, "id", "v", k = 5, blockBits = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    blocked.foreach { case (id, (kEff, mean)) =>
      assert(kEff >= 2 && kEff <= 5, s"$id k_eff $kEff")
      assert(mean > 0.9, s"$id: within-cluster density $mean should be ≈1")
    }
  }

  test("modularity: exact-BIGINT bound is enforced, not just documented") {
    import graft.operators.LabelPropagation
    val labels = Seq(("a", 1L), ("b", 1L)).toDF("id", "label")
    // symmetric pair with 2e9 weight each way: E = 4e9 > the 3e9 bound,
    // where E² would silently wrap a BIGINT
    val heavy = Seq(("a", "b", 2000000000L), ("b", "a", 2000000000L))
      .toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      LabelPropagation.modularityWeighted(labels, heavy, "w").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("exact-BIGINT bound")), ex.toString)

    // at the bound (not past it): still computes, exactly
    val ok = Seq(("a", "b", 1500000000L), ("b", "a", 1500000000L))
      .toDF("src", "dst", "w")
    val row = LabelPropagation.modularityWeighted(labels, ok, "w")
      .select("contrib_num", "contrib_den").head()
    // one community holding everything: Ein = E, deg = E -> num = E·E − E² = 0
    assert(row.getLong(0) == 0L && row.getLong(1) == 9000000000000000000L)
  }

  test("kCenter: farthest-point order and nondecreasing coverage on a known set") {
    // p1 seed (min id); p2 orthogonal to it; p4 on the diagonal; p3 nearly
    // parallel to p1 — the greedy order must be p1, p2, p4, p3.
    val pts = Seq(
      ("p1", Array(1.0f, 0.0f)),
      ("p2", Array(0.0f, 1.0f)),
      ("p3", Array(1.0f, 0.05f)),
      ("p4", Array(0.7f, 0.7f))).toDF("id", "v")
    val out = VectorSearch.kCenter(pts, "id", "v", k = 4)
      .collect().map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.map(_._2).toSeq == Seq("p1", "p2", "p4", "p3"), out.toSeq)
    assert(out.head._3.isEmpty)
    val covs = out.tail.map(_._3.get)
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b },
      s"coverage curve must be nondecreasing: ${covs.toSeq}")
    assert(math.abs(covs.head - 0.0) < 1e-9) // p2 is orthogonal to the seed
    // k beyond the corpus stops early; empty input yields the schema, no crash
    assert(VectorSearch.kCenter(pts, "id", "v", k = 10).count() == 4)
    val empty = Seq.empty[(String, Array[Float])].toDF("id", "v")
    assert(VectorSearch.kCenter(empty, "id", "v", k = 3).count() == 0)
  }

  test("collocations: PMI of the only repeated pair matches the hand formula") {
    import graft.operators.CorpusOps
    val docs = Seq(
      Tuple1(Seq("new", "york", "is", "big")),
      Tuple1(Seq("new", "york", "wins")),
      Tuple1(Seq("big", "apple"))).toDF("toks")
    val out = CorpusOps.collocations(docs, "toks", minCount = 2L, topK = 10).collect()
    assert(out.length == 1, out.toSeq) // only "new york" appears twice
    assert(out.head.getString(0) == "new york" && out.head.getLong(1) == 2L)
    // pmi = ln(c·N1²/(N2·ca·cb)) = ln(2·81/(6·2·2)) = ln 6.75
    assert(math.abs(out.head.getDouble(2) - math.log(6.75)) < 1e-9)
  }

  test("stupidBackoff: each backoff arm reproduces the hand-computed score") {
    import graft.operators.CorpusOps
    val train = Seq(Tuple1(Seq("a", "b", "c", "a", "b", "d"))).toDF("toks")
    // N = 6, V = 4; c1: a=2 b=2 c=1 d=1; c2: "a b"=2 "b c"=1 "c a"=1 "b d"=1
    val scored = Seq(
      ("t1", Seq("a", "b", "c")), // trigram seen: c3/c2 = 1/2
      ("t2", Seq("x", "a", "b")), // trigram unseen, bigram "a b" seen: 0.4·(2/c1(a)=2)
      ("t3", Seq("a", "b", "x")), // both unseen, x unseen: 0.4²·(0+1)/(6+4)
      ("t4", Seq("a", "b"))) // too short: absent
      .toDF("doc_id", "toks")
    val out = CorpusOps.stupidBackoff(train, scored, "doc_id", "toks")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains("t4") && out.keySet == Set("t1", "t2", "t3"))
    assert(out("t1")._1 == 1L && math.abs(out("t1")._2 - math.log(0.5)) < 1e-12)
    assert(math.abs(out("t2")._2 - math.log(0.4 * 1.0)) < 1e-12)
    assert(math.abs(out("t3")._2 - math.log(0.4 * 0.4 * 0.1)) < 1e-12)
  }

  test("nnDescent: deterministic, degree-bounded, rounds improve recall to ~exact") {
    import graft.operators.NnDescent
    // 3 tight clusters × 40 points: big enough that the hash-bucket init
    // (~32-node buckets) cannot be exact, so the wedge rounds must do the work
    val pts = (for (c <- 0 until 3; i <- 0 until 40) yield {
      val v = Array.fill(4)(0.0f); v(c) = 1.0f; v(3) = 0.001f * i
      (f"c${c}p$i%02d", v)
    }).toDF("id", "v")
    def build(rounds: Int) = NnDescent.knnGraph(pts, "id", "v", k = 3, rounds = rounds)
    val g1 = build(2).collect()
      .map(r => (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 1e9))).toSet
    val g2 = build(2).collect()
      .map(r => (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 1e9))).toSet
    assert(g1 == g2, "two builds must produce the identical graph")
    assert(g1.toSeq.groupBy(_._1).values.forall(_.size <= 3), "degree must be <= k")
    val recInit = NnDescent.recallAtK(pts, "id", "v", 3, build(0), sampleMod = 1)
    val rec3 = NnDescent.recallAtK(pts, "id", "v", 3, build(3), sampleMod = 1)
    assert(rec3 >= recInit, s"rounds must not lose recall: $recInit -> $rec3")
    assert(rec3 >= 0.85, s"3 rounds on tight clusters should approach exact, got $rec3")
    // empty input: schema'd empty frame, no count() crash
    val empty = Seq.empty[(String, Array[Float])].toDF("id", "v")
    assert(NnDescent.knnGraph(empty, "id", "v", k = 3, rounds = 2).count() == 0)
  }

  test("urlOps: every canonicalization arm + domain rules + capPerKey determinism") {
    import graft.functions.UrlOps
    val in = Seq(
      "HTTPS://WWW.Ex.COM:443/a//b/?utm_source=x&z=2&a=1#f",
      "http://ex.com:80",                    // empty path -> /
      "https://ex.com:8443/p/",              // non-default port kept, slash stripped
      "http://a.b.co.uk/x?fbclid=1&gclid=2", // all params tracking -> no query
      "http://localhost/x",                  // single-label host
      "https://ex.com/?a=1&a=0",             // duplicate keys survive, sorted
      "https://app.ex.com/#/settings?tab=1", // '?' inside fragment != query
      "http://alice:pw@ex.com/x",            // userinfo dropped
      "https://[2001:db8::1]:8443/v",        // IPv6 literal + non-default port
      "http://ex.com./x",                    // trailing-dot FQDN
      "https://ex.com/a?UTM_Source=f&fbclid" // uppercase + valueless tracking
    ).toDF("u")
    val out = in.select(UrlOps.canonicalizeUrl(col("u")).as("c"),
        UrlOps.registeredDomain(UrlOps.hostOf(col("u"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == ("https://ex.com/a/b?a=1&z=2", "ex.com"))
    assert(out(1) == ("http://ex.com/", "ex.com"))
    assert(out(2) == ("https://ex.com:8443/p", "ex.com"))
    assert(out(3) == ("http://a.b.co.uk/x", "b.co.uk"))
    assert(out(4) == ("http://localhost/x", "localhost"))
    assert(out(5) == ("https://ex.com/?a=0&a=1", "ex.com"))
    assert(out(6) == ("https://app.ex.com/", "ex.com"))
    assert(out(7) == ("http://ex.com/x", "ex.com"))
    assert(out(8) == ("https://[2001:db8::1]:8443/v", "[2001:db8::1]"))
    assert(out(9) == ("http://ex.com/x", "ex.com"))
    assert(out(10) == ("https://ex.com/a", "ex.com"))
    // capPerKey: kept set is a pure function of ids (repartition-stable)
    val rows = (1 to 50).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "id")
    import graft.operators.CorpusOps
    val a = CorpusOps.capPerKey(rows, "k", "id", 5).collect().map(_.toString).sorted
    val b = CorpusOps.capPerKey(rows.repartition(7), "k", "id", 5)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b) && a.length == 15)
  }

  test("lastTouchAttribution: last wins, window expiry, organic, same-ts tie by id") {
    import graft.operators.EventAnalytics
    val day = 86400000000000L
    // (event_id, user, ts_ns, type, value)
    val ev = Seq(
      (1L, 1L, 0L, "click", 0.0), (2L, 1L, day, "view", 0.0),
      (3L, 1L, day + 1, "purchase", 9.99),               // last touch = view(2)
      (4L, 2L, 0L, "click", 0.0),
      (5L, 2L, 5 * day, "purchase", 1.0),                // click too old -> organic
      (6L, 3L, day, "purchase", 2.0), (7L, 3L, day, "click", 0.0),
      (8L, 3L, day, "view", 0.0)                         // same ts: only id<6 counts
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "value",
        Seq("click", "view"), "purchase", windowNs = 3 * day)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.toString), Option(r.get(5)).map(_.toString))).toMap
    assert(out(3L) == (Some("view"), Some("2")), s"got ${out(3L)}")
    assert(out(5L) == (None, None), "out-of-window touch must be organic")
    // user 3: touches 7,8 share the purchase ts but have HIGHER ids -> organic
    assert(out(6L) == (None, None), "same-ts later-id touches must not count")
  }

  test("betweennessBounded: chain dependency, diamond path counts, multi-seed sum") {
    import graft.operators.ShortestPaths
    def sym(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    // chain 1-2-3-4-5, seed 1, hops 3: delta(2) = 1*(1+delta(3)) = 2,
    // delta(3) = 1, node 4 at the bound contributes nothing (truncated)
    val chain = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out1 = ShortestPaths.betweennessBounded(chain,
        Seq(1L).toDF("node"), hops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out1 == Map(2L -> (1L, 2.0), 3L -> (1L, 1.0)), s"chain: $out1")
    // diamond 10-11-13 / 10-12-13: two shortest paths, sigma(13) = 2,
    // so each middle node carries delta = 1/2 from seed 10; adding seed 13
    // doubles it symmetrically -> bc = 1.0 from 2 seeds
    val diamond = sym((10L, 11L), (10L, 12L), (11L, 13L), (12L, 13L))
    val out2 = ShortestPaths.betweennessBounded(diamond,
        Seq(10L, 13L).toDF("node"), hops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out2 == Map(11L -> (2L, 1.0), 12L -> (2L, 1.0)), s"diamond: $out2")
  }

  test("snapshotDiff: add/remove/change, unchanged filtered, null==empty documented") {
    import graft.operators.CorpusOps
    val v1 = Seq((1L, Option("a"), Option("s")), (2L, Option("b"), Option("s")),
      (3L, Option("c"), Option("s")), (4L, None: Option[String], Option("s")))
      .toDF("id", "text", "src")
    val v2 = Seq((1L, Option("a"), Option("s")), (2L, Option("B"), Option("s")),
      (5L, Option("e"), Option("s")), (4L, Option(""), Option("s")))
      .toDF("id", "text", "src")
    val out = CorpusOps.snapshotDiff(v1, v2, "id", Seq("text", "src"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 5L -> "added"),
      s"id 1 unchanged and id 4 null==empty must be absent, got $out")
  }

  test("kneserNeyBigram: every arm hand-computed on a 3-bigram corpus") {
    // train bigrams: (a,b) (a,c) (b,c), each once
    //   ctx: a -> cv=2, n1f=2 ; b -> cv=1, n1f=1
    //   prd: b -> n1p=1 ; c -> n1p=2 ; N1+(..)=3 types, V=3
    //   Pcont(w) = (n1p + 1) / (3 + 3 + 1)
    val train = Seq(Seq("a", "b"), Seq("a", "c"), Seq("b", "c")).toDF("toks")
      .withColumn("id", lit("t"))
    val scored = Seq(("s1", Seq("a", "b", "d")), ("s2", Seq("d", "a")))
      .toDF("id", "toks")
    val out = graft.operators.CorpusOps.kneserNeyBigram(train, scored, "id", "toks")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pcont = (n1p: Int) => (n1p + 1.0) / 7.0
    // s1: seen bigram (a,b): max(1-.75,0)/2 + .75*2/2*Pcont(b)
    //     seen ctx, unseen bigram (b,d): 0/1 + .75*1/1*Pcont(d)
    val p1 = 0.25 / 2 + 0.75 * 2 / 2 * pcont(1)
    val p2 = 0.75 * 1 / 1 * pcont(0)
    assert(out("s1")._1 == 2L)
    assert(math.abs(out("s1")._2 - (math.log(p1) + math.log(p2)) / 2) < 1e-12)
    // s2: unseen ctx (d,a): Pcont(a) with a never a continuation -> 1/7
    assert(out("s2")._1 == 1L)
    assert(math.abs(out("s2")._2 - math.log(1.0 / 7.0)) < 1e-12)
    // the KN property: after "a", seen continuation b beats the OOV floor
    assert(p1 > p2)
  }

  test("pairedPermTest: null case, one-sided case, determinism") {
    import graft.eval.Recall
    def run(d: Seq[Int]) = {
      val perQ = d.zipWithIndex.map { case (v, i) => (f"q$i%03d", v, 0) }
        .toDF("qid", "a", "b")
      Recall.pairedPermTest(perQ, "qid", "a", "b", reps = 200).collect().head
    }
    // all-zero deltas: every permuted sum equals the observed 0 -> p = 1
    val z = run(Seq.fill(30)(0))
    assert(z.getAs[Long]("n_questions") == 30L)
    assert(z.getAs[Double]("p_value_r") == 1.0)
    assert(z.getAs[Double]("mean_diff_r") == 0.0)
    // uniformly one-sided (every d_i = +1, n = 30): only an all-heads
    // replicate ties the observed sum, P ~ 200 * 2^-30 ~ 0 -> p = 1/201
    val o = run(Seq.fill(30)(1))
    assert(math.abs(o.getAs[Double]("p_value_r") - 1.0 / 201.0) < 1e-6,
      s"one-sided p should be the add-one floor, got ${o.getAs[Double]("p_value_r")}")
    assert(o.getAs[Double]("mean_diff_r") == 1.0)
    // perfectly balanced +1/-1: the delta is sign-flip noise by construction
    val b = run(Seq.tabulate(30)(i => if (i % 2 == 0) 1 else -1))
    assert(b.getAs[Double]("p_value_r") > 0.5,
      s"balanced deltas must not be significant, got ${b.getAs[Double]("p_value_r")}")
    // hash-determinism: identical reruns
    assert(run(Seq.tabulate(20)(i => i % 3 - 1)) == run(Seq.tabulate(20)(i => i % 3 - 1)))
  }

  test("empty input: blockBits > 0 yields empty results, not a head() crash") {
    val empty = Seq.empty[(String, String, Array[Float])].toDF("id", "lab", "v")
    assert(VectorSearch.hardNegatives(empty, "id", "v", "lab", k = 3,
      minCosine = 0.0, blockBits = 3).count() == 0)
    assert(VectorSearch.mutualKnn(empty, "id", "v", k = 3, blockBits = 3).count() == 0)
    assert(VectorSearch.labelAgreement(empty, "id", "v", "lab", k = 3,
      blockBits = 3).count() == 0)
    assert(VectorSearch.knnDensity(empty, "id", "v", k = 3, blockBits = 3).count() == 0)
    assert(Dedup.embeddingNearDupPairs(empty, "id", "v", minCosine = 0.5,
      blockBits = 3).count() == 0)
  }
}
