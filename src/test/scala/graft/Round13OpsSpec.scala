package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-13 additions: the UrlOps crawl-shape prelude
  * (scheme-less / protocol-relative / opaque / malformed-port refs) and the
  * capPerKey null-id contract enforcement. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("urlOps prelude: schemeless, protocol-relative, opaque, malformed refs") {
    import graft.functions.UrlOps
    val in = Seq(
      "example.com/page",                 // bare -> http assumed
      "WWW.Ex.com//a/?utm_source=1&b=2",  // bare + www + noise
      "//cdn.example.com/x.js",           // protocol-relative -> http
      "example.com",                      // bare host only -> '/'
      "localhost:8080/x",                 // bare host:port (digit after ':')
      "mailto:a@b.com",                   // opaque -> pass-through, host ''
      "tel:+15551234",                    // opaque -> pass-through
      "data:text/html;base64,AA==",       // opaque -> pass-through
      "http://ex.com:8o80/x",             // malformed port -> pass-through
      "http://ex.com:/x",                 // empty port marker -> pass-through
      "https://[2001:db8::1]:bad/v",      // malformed bracketed port
      "",                                 // empty input -> pass-through
      ":///"                              // garbage -> pass-through (not merged)
    ).toDF("u")
    val out = in.select(UrlOps.canonicalizeUrl(col("u")).as("c"),
        UrlOps.registeredDomain(UrlOps.hostOf(col("u"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == ("http://example.com/page", "example.com"))
    assert(out(1) == ("http://ex.com/a?b=2", "ex.com"))
    assert(out(2) == ("http://cdn.example.com/x.js", "example.com"))
    assert(out(3) == ("http://example.com/", "example.com"))
    assert(out(4) == ("http://localhost:8080/x", "localhost"))
    assert(out(5) == ("mailto:a@b.com", ""))
    assert(out(6) == ("tel:+15551234", ""))
    assert(out(7) == ("data:text/html;base64,AA==", ""))
    assert(out(8) == ("http://ex.com:8o80/x", "ex.com"))
    assert(out(9) == ("http://ex.com:/x", "ex.com"))
    assert(out(10) == ("https://[2001:db8::1]:bad/v", "[2001:db8::1]"))
    assert(out(11) == ("", ""))
    assert(out(12) == (":///", ""))
    // distinct malformed refs must stay distinct dedup keys (the old
    // degenerate ':///'-collapse silently merged them)
    val keys = Seq("mailto:a@b.com", "mailto:c@d.com", ":///x", ":///y").toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).distinct
    assert(keys.length == 4)
  }

  test("nn-descent consumers: mutualKnnFrom/knnDensityFrom agree with exact at graph recall") {
    import graft.operators.{NnDescent, VectorSearch}
    // 12 points, 3 tight clusters; n < 32 puts everything in ONE init bucket,
    // so the graph is exact by construction (recall 1.0) and the consumer
    // outputs must be BIT-equal to the n²-scan operators.
    val pts = Seq(
      ("a1", Array(1.0f, 0.01f, 0f, 0f)), ("a2", Array(1.0f, 0.02f, 0f, 0f)),
      ("a3", Array(1.0f, 0.03f, 0f, 0f)), ("a4", Array(1.0f, 0.04f, 0f, 0f)),
      ("b1", Array(0f, 1.0f, 0.01f, 0f)), ("b2", Array(0f, 1.0f, 0.02f, 0f)),
      ("b3", Array(0f, 1.0f, 0.03f, 0f)), ("b4", Array(0f, 1.0f, 0.04f, 0f)),
      ("c1", Array(0f, 0f, 1.0f, 0.01f)), ("c2", Array(0f, 0f, 1.0f, 0.02f)),
      ("c3", Array(0f, 0f, 1.0f, 0.03f)), ("c4", Array(0f, 0f, 1.0f, 0.04f))
    ).toDF("id", "v")
    val g = NnDescent.knnGraph(pts, "id", "v", k = 3, rounds = 2)
      .localCheckpoint(true)
    val rec = NnDescent.recallAtK(pts, "id", "v", 3, g, sampleMod = 1)
    assert(rec == 1.0, s"single-bucket fixture must be exact, recall=$rec")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val exactMut = edges(VectorSearch.mutualKnn(pts, "id", "v", 3))
    val approxMut = edges(VectorSearch.mutualKnnFrom(g))
    assert(exactMut.nonEmpty && approxMut == exactMut)
    def dens(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val de = dens(VectorSearch.knnDensity(pts, "id", "v", 3))
    val da = dens(VectorSearch.knnDensityFrom(g))
    assert(da == de) // bit-equal: same lists, same sorted fold order
    // allIds: a node missing from the graph surfaces as k_eff = 0, not a
    // silently lost row
    val surfaced = VectorSearch.knnDensityFrom(
        g.filter(col("id") =!= "a1"), Some(pts.select("id")))
      .filter(col("id") === "a1").collect()
    assert(surfaced.length == 1 && surfaced(0).getLong(1) == 0L &&
      surfaced(0).isNullAt(2))
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(g)
  }

  test("textRank: hand-computed two-iteration scores, rank order, dropouts") {
    import graft.operators.TextRank
    val docs = Seq(("d1", "a b a c"), ("d2", "solo"), ("d3", "")).toDF("id", "text")
    val out = TextRank.keywords(docs, "id", "text", topK = 5, iterations = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // d1 graph: {a-b, a-c}; deg a=2, b=1, c=1. Hand-replay of the exact
    // double arithmetic (init 1.0, ordered neighbor folds):
    val d = 0.85
    val tA1 = (1.0 - d) + d * (0.0 + 1.0 / 1 + 1.0 / 1) // nbrs b, c
    val tB1 = (1.0 - d) + d * (0.0 + 1.0 / 2)           // nbr a
    val tA2 = (1.0 - d) + d * (0.0 + tB1 / 1 + tB1 / 1)
    val tB2 = (1.0 - d) + d * (0.0 + tA1 / 2)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("d1", 1, "a"), ("d1", 2, "b"), ("d1", 3, "c"))) // b before c on tie
    assert(out(0)._4 == tA2 && out(1)._4 == tB2 && out(2)._4 == tB2)
    // single-token and empty docs have no co-occurrence node: no rows, by doc
    assert(!out.exists(t => t._1 == "d2" || t._1 == "d3"))
  }

  test("capPerKey: null id fails loudly instead of sampling unstably") {
    import graft.operators.CorpusOps
    val rows = Seq(("k", java.lang.Long.valueOf(1L)), ("k", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "id")
    val e = intercept[Exception] {
      CorpusOps.capPerKey(rows, "k", "id", 5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("capPerKey: null id")))
  }

  test("biasedWalks: weight classes steer second-order hops") {
    import graft.operators.RandomWalk
    // triangle 1-2-3 plus tail 3-4-5
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(3L).toDF("node")
    // return weight dominant: step 2 must step BACK to the seed
    val ret = RandomWalk.biasedWalks(edges, seeds, steps = 2,
        wReturn = 1000000L, wInner = 1L, wOuter = 1L)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(ret(0) == 3L && ret(2) == 3L && ret(1) != 3L)
    // triangle weight dominant: a step-1 hop into the triangle must close
    // it at step 2 (candidate adjacent to prev=3 ≫ return/outer)
    val inn = RandomWalk.biasedWalks(edges, seeds, steps = 2,
        wReturn = 1L, wInner = 1000000L, wOuter = 1L)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    if (inn(1) == 1L) assert(inn(2) == 2L)
    if (inn(1) == 2L) assert(inn(2) == 1L)
    // deterministic: the same inputs reproduce the same walk exactly
    val again = RandomWalk.biasedWalks(edges, seeds, steps = 2,
        wReturn = 1L, wInner = 1000000L, wOuter = 1L)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(again == inn)
    // schema composes with skipGramPairs unchanged
    val pairs = RandomWalk.skipGramPairs(
      RandomWalk.biasedWalks(edges, seeds, steps = 3, 1L, 4L, 2L), window = 2)
    assert(pairs.columns.toSeq == Seq("center", "context", "pair_count"))
    assert(pairs.count() > 0)
    // weighted form: a dominant edge multiplicity wins the uniform draw
    val wEdges = (und ++ und.map(_.swap)).map { case (s2, d2) =>
      (s2, d2, if (Set(s2, d2) == Set(3L, 1L)) 1000000L else 1L)
    }.toDF("src", "dst", "w")
    val wz = RandomWalk.biasedWalks(wEdges, seeds, steps = 1,
        1L, 1L, 1L, edgeWeightCol = Some("w"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(wz(1) == 1L)
  }

  test("frequentPairs: supports, lift, and the A-priori prune") {
    import graft.operators.FrequentItemsets
    // baskets: {a,b,c} {a,b} {a,b,d} {c,d} {a,x} — x appears once (pruned),
    // (a,b) support 3, (a,c)/(a,d)/(b,c)/(b,d)/(c,d) support 1.
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "d"), (3L, "d"), // dup (basket,item) row
      (4L, "c"), (4L, "d"),
      (5L, "a"), (5L, "x")).toDF("basket", "item")
    val out = FrequentItemsets.frequentPairs(rows, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // only (a,b) reaches pair support 2; counts a=4, b=3, n=5
    assert(out.toSeq == Seq(("a", "b", 3L, 4L, 3L, 5L,
      1000000L * 3 * 5 / (4 * 3))))
    // lift > 1e6: a and b co-occur more than independence predicts
    assert(out.head._7 == 1250000L)
    // minSupport above max pair support -> empty, not an error
    assert(FrequentItemsets.frequentPairs(rows, "basket", "item", 4L).count() == 0)
    // hot-basket guard: capping at 2 drops basket 1 ({a,b,c}) and basket 3
    // ({a,b,d}) from pair counting -> (a,b) support falls to 1 -> no rows
    assert(FrequentItemsets.frequentPairs(rows, "basket", "item", 2L,
      maxBasketSize = Some(2L)).count() == 0)
    // a cap wide enough to keep every basket is a no-op
    assert(FrequentItemsets.frequentPairs(rows, "basket", "item", 2L,
      maxBasketSize = Some(10L)).collect().map(_.getLong(2)).toSeq == Seq(3L))
  }

  test("skipGramPairs: window band over hand-built walks") {
    import graft.operators.RandomWalk
    // walk 1: A B C D ; walk 2: A B (steps 0..n)
    val walks = Seq(
      (1L, 0, "A"), (1L, 1, "B"), (1L, 2, "C"), (1L, 3, "D"),
      (2L, 0, "A"), (2L, 1, "B")).toDF("walk_id", "step", "node")
    val out = RandomWalk.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // within window 2 on walk1: A-B A-C B-C B-D C-D; walk2 adds A-B.
    // symmetric directions, counts: (A,B)=2 (both walks), others 1.
    assert(out == Set(
      ("A", "B", 2L), ("B", "A", 2L), ("A", "C", 1L), ("C", "A", 1L),
      ("B", "C", 1L), ("C", "B", 1L), ("B", "D", 1L), ("D", "B", 1L),
      ("C", "D", 1L), ("D", "C", 1L)))
    // window 1 drops the distance-2 pairs
    val w1 = RandomWalk.skipGramPairs(walks, window = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!w1.contains(("A", "C")) && w1.contains(("A", "B")))
  }

  test("dataValidation: every check kind counts exactly its own failures") {
    import graft.operators.DataValidation
    import graft.operators.DataValidation._
    val rows = Seq(
      (java.lang.Long.valueOf(1L), "a@x.com", "US", 10.0),
      (java.lang.Long.valueOf(1L), "b@y.org", "DE", 200.0), // dup id, range viol
      (java.lang.Long.valueOf(2L), "not-an-email", "US", 50.0), // regex viol
      (null.asInstanceOf[java.lang.Long], null, "XX", -5.0) // null id+email, set+range viol
    ).toDF("id", "email", "country", "amount")
    val ref = Seq("US", "DE", "FR").toDF("code")
    val rep = DataValidation.report(rows, Seq(
        NotNull("id_not_null", "id"),
        NotNull("email_not_null", "email"),
        InRange("amount_0_100", "amount", 0.0, 100.0),
        Matches("email_shape", "email", "^[^@]+@[^@]+$"),
        InSet("country_known", "country", Seq("US", "DE", "FR")),
        Unique("id_unique", Seq("id")),
        RefIntegrity("country_fk", "country", ref, "code")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("id_not_null") == ((1L, 4L, 250000L)))
    assert(rep("email_not_null") == ((1L, 4L, 250000L)))
    assert(rep("amount_0_100") == ((2L, 4L, 500000L)))
    // null email is NOT a regex violation (NotNull's job)
    assert(rep("email_shape") == ((1L, 4L, 250000L)))
    assert(rep("country_known") == ((1L, 4L, 250000L)))
    // ids: (1, 1, 2, null) -> 4 rows, 3 distinct tuples -> 1 surplus
    assert(rep("id_unique")._1 == 1L)
    assert(rep("country_fk") == ((1L, 4L, 250000L)))
    assert(rep.size == 7)
    // duplicate names fail fast
    intercept[IllegalArgumentException] {
      DataValidation.report(rows, Seq(NotNull("x", "id"), NotNull("x", "email")))
    }
    // an all-FK check list must produce the FK rows, not crash on the
    // empty unpivot
    val fkOnly = DataValidation.report(rows,
        Seq(RefIntegrity("country_fk2", "country", ref, "code")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(fkOnly.toSeq == Seq(("country_fk2", 1L, 4L)))
    // profile: one row per column, nulls/distinct/min/max; fractional
    // min/max in fixed point
    val prof = DataValidation.profile(rows, Seq("id", "country", "amount"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(prof("id") == ((4L, 1L, 2L, "1", "2")))
    assert(prof("country") == ((4L, 0L, 3L, "DE", "XX")))
    assert(prof("amount") == ((4L, 0L, 4L, "-5.000000", "200.000000")))
  }

  test("privacy: k-anonymity and l-diversity histograms on a known table") {
    import graft.operators.Privacy
    // quasi (zip, age): classes AA:3 rows, BB:2, CC:1 -> k = 1
    val rows = Seq(
      ("10001", 30, "flu"), ("10001", 30, "flu"), ("10001", 30, "cold"),
      ("10002", 40, "flu"), ("10002", 40, "ulcer"),
      ("10003", 50, "cold")).toDF("zip", "age", "diagnosis")
    val k = Privacy.kAnonymityHistogram(rows, Seq("zip", "age"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k == Set((3L, 1L, 3L), (2L, 1L, 2L), (1L, 1L, 1L)))
    // l-diversity of diagnosis: AA has 2 distinct, BB 2, CC 1
    val l = Privacy.lDiversityHistogram(rows, Seq("zip", "age"), "diagnosis")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(l == Set((2L, 2L), (1L, 1L)))
    // a fully generalized quasi-id collapses to one k=n class
    val k1 = Privacy.kAnonymityHistogram(rows.withColumn("zip", lit("1000*")),
        Seq("zip")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k1 == Set((6L, 1L)))
    // ladder: raw (k=1, one unique row) -> 4-digit zip prefix (all share
    // "1000" -> one k=6 class) -> suppressed (same)
    val lad = Privacy.generalizationLadder(rows, Seq(
        "raw" -> Seq("zip" -> col("zip"), "age" -> col("age")),
        "zip3" -> Seq("zip3" -> substring(col("zip"), 1, 4)),
        "suppressed" -> Seq("all" -> lit("*"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(lad.toSeq == Seq((0L, "raw", 1L, 3L, 1L),
      (1L, "zip3", 6L, 1L, 0L), (2L, "suppressed", 6L, 1L, 0L)))
  }

  test("pca: moment sums match brute force; fit recovers the planted axis") {
    import graft.operators.Pca
    // 2-dim signal planted in 4 dims: x = t·(0.6, 0.8, 0, 0) + tiny noise
    // on dim 2 — top PC must align with (0.6, 0.8, 0, 0).
    val data = (0 until 40).map { k =>
      val tt = (k % 21 - 10) / 10.0 // -1.0 .. 1.0
      val noise = ((k * 7919) % 11 - 5) / 100.0
      (k.toLong, Array((0.6 * tt).toFloat, (0.8 * tt).toFloat,
        noise.toFloat, 0.0f))
    }
    val df = data.toDF("id", "vec")
    val m = Pca.momentSums(df, "vec", dim = 4)
    val rows = m.collect().map(r => ((r.getInt(0), r.getInt(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size == 10) // 4*(4+1)/2 upper-triangle cells
    // brute-force the same quantized sums for two cells
    val q = data.map(_._2.map(x => math.floor(x.toDouble * 10000).toLong))
    def cell(i: Int, j: Int) = (40L, q.map(_(i)).sum, q.map(_(j)).sum,
      q.map(v => v(i) * v(j)).sum)
    assert(rows((0, 1)) == cell(0, 1))
    assert(rows((2, 3)) == cell(2, 3))
    assert(rows((1, 1)) == cell(1, 1))
    val model = Pca.fit(m, dim = 4)
    // eigenvalues descending, components orthonormal
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    val c = model.components
    for (a <- c.indices; b <- c.indices) {
      val d = c(a).indices.map(i => c(a)(i) * c(b)(i)).sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    // planted axis recovered (|cos| > 0.999); sign convention pins + lead
    val cos = 0.6 * c(0)(0) + 0.8 * c(0)(1)
    assert(math.abs(cos) > 0.999 && c(0).map(math.abs).max > 0)
    // projection onto pc0 carries (nearly) all the variance
    val proj = Pca.project(df, "id", "vec", model, k = 2)
      .groupBy("pc").agg(round(var_samp(col("value")), 9).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(proj(0) > proj(1) * 50)
    assert(math.abs(proj(0) - model.eigenvalues(0) * 40.0 / 39.0) < 1e-3)
    // whitening: every component's variance normalizes to ~1 (n/(n-1) bias)
    val white = Pca.project(df, "id", "vec", model, k = 2, whiten = true)
      .groupBy("pc").agg(var_samp(col("value")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(white(0) - 40.0 / 39.0) < 0.01)
    assert(math.abs(white(1) - 40.0 / 39.0) < 0.05)
  }

  test("streaming moments maintenance: merged state == one-shot momentSums") {
    import graft.operators.Pca
    import graft.streaming.StreamingOps
    val dir = java.nio.file.Files.createTempDirectory("stream_pca").toString
    val all = (0 until 30).map { k =>
      (k.toLong, Array((0.1 * (k % 7 - 3)).toFloat, (0.05 * (k % 4)).toFloat,
        (-0.2 + 0.01 * k).toFloat))
    }.toDF("id", "vec")
    all.filter($"id" < 10).write.parquet(s"$dir/in/a")
    all.filter($"id" >= 10 && $"id" < 20).write.parquet(s"$dir/in/b")
    all.filter($"id" >= 20).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.momentsMaintain(stream, "vec", dim = 3, s"$dir/state")
    q.processAllAvailable(); q.stop()
    val cell = (df: org.apache.spark.sql.DataFrame) => df
      .as[(Int, Int, Long, Long, Long, Long)].collect().toSet
    val streamed = cell(spark.read.parquet(s"$dir/state"))
    val oneShot = cell(Pca.momentSums(all, "vec", dim = 3))
    assert(streamed == oneShot) // bit-equal mergeability
    // the saved state is directly fit-able
    val model = Pca.fit(spark.read.parquet(s"$dir/state"), dim = 3)
    assert(model.n == 30L && model.eigenvalues.length == 3)
  }

  test("pca removeTopComponents: residual is orthogonal to the removed axes") {
    import graft.operators.Pca
    val data = (0 until 30).map { k =>
      val tt = (k % 15 - 7) / 7.0
      (k.toLong, Array((0.8 * tt + 0.01 * (k % 3)).toFloat,
        (0.6 * tt).toFloat, (0.05 * (k % 5 - 2)).toFloat, 0.1f))
    }
    val df = data.toDF("id", "vec")
    val model = Pca.fit(Pca.momentSums(df, "vec", dim = 4), dim = 4)
    val out = Pca.removeTopComponents(df, "vec", model, k = 1)
      .orderBy("id").collect().map(_.getSeq[Double](1).toArray)
    // every residual ⟂ pc0 (up to the 1e-4 moment quantization)
    out.foreach { r =>
      val d = r.indices.map(i => r(i) * model.components(0)(i)).sum
      assert(math.abs(d) < 1e-3, s"residual not orthogonal: $d")
    }
    // matches the brute-force residual of the centered raw vector
    val c0 = data.head._2.map(_.toDouble).zip(model.mean).map { case (x, m) => x - m }
    val p0 = c0.indices.map(i => c0(i) * model.components(0)(i)).sum
    val expect = c0.indices.map(i => c0(i) - p0 * model.components(0)(i))
    out.head.indices.foreach(i => assert(math.abs(out.head(i) - expect(i)) < 1e-9))
    // schema untouched: same columns, vec replaced
    assert(Pca.removeTopComponents(df, "vec", model, 2).columns.toSeq
      == Seq("id", "vec"))
  }
}
