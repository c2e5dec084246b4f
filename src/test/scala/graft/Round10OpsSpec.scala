package graft

import graft.operators.{BooleanRetrieval, Chunker, Dedup, EventAnalytics, LinkPrediction}
import org.apache.spark.sql.functions._

/** Round-10 operator batch: neighbor-overlap link prediction, ROC AUC,
  * event anomaly/transition analytics, sentence segmentation, boolean
  * retrieval, candidate-pair quality. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("g22 neighborOverlap: hand-checked Jaccard on a 5-node path+triangle") {
    // Graph: 1-2, 2-3, 3-4, 2-4 (triangle 2-3-4 plus pendant 1).
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = LinkPrediction.neighborOverlap(edges, maxHubDegree = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // Candidate non-edges at distance 2: (1,3) via 2, (1,4) via 2.
    // deg(1)=1, deg(3)=2, deg(4)=2 → jaccard = 1/(1+2-1) = 0.5.
    assert(got.keySet == Set((1L, 3L), (1L, 4L)))
    assert(got((1L, 3L)) == (1L, 0.5))
    assert(got((1L, 4L)) == (1L, 0.5))
  }

  test("g22 neighborOverlap: hub cap drops wedges through the hub only") {
    // Star center 10 with leaves 1..5; pair (1,2) also wedges through 20.
    val und = (1L to 5L).map(l => (10L, l)) ++ Seq((20L, 1L), (20L, 2L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val capped = LinkPrediction.neighborOverlap(edges, maxHubDegree = 2)
    // center 10 (deg 5) pruned: (1,2) now wedges only through 20 (deg 2),
    // so its common count is 1, not 2; (10,20) wedges through the degree-2
    // leaves 1 and 2, both surviving centers.
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keySet == Set((1L, 2L), (10L, 20L)))
    assert(rows((1L, 2L)) == 1L) // through 20 only, not through 10
    assert(rows((10L, 20L)) == 2L) // through centers 1 and 2
  }

  test("m8 aucRoc: perfect separation = 1, reversed = 0, ties average to 0.5") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    assert(graft.eval.Recall.aucRoc(perfect, "s", "y")
      .select("auc").as[Double].head() == 1.0)
    val reversed = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)).toDF("s", "y")
    assert(graft.eval.Recall.aucRoc(reversed, "s", "y")
      .select("auc").as[Double].head() == 0.0)
    // All scores identical: every pair is a tie → AUC exactly 0.5.
    val ties = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("s", "y")
    assert(graft.eval.Recall.aucRoc(ties, "s", "y")
      .select("auc").as[Double].head() == 0.5)
    // Single-class input: AUC undefined → NULL, never 0-by-fiat.
    val oneClass = Seq((0.9, 1), (0.1, 1)).toDF("s", "y")
    assert(graft.eval.Recall.aucRoc(oneClass, "s", "y")
      .select("auc").collect().head.isNullAt(0))
  }

  test("m8 aucRoc agrees with the O(n²) pair definition on a mixed case") {
    val rows = Seq((0.9, 1), (0.7, 0), (0.7, 1), (0.4, 1), (0.2, 0), (0.1, 0))
    val auc = graft.eval.Recall.aucRoc(rows.toDF("s", "y"), "s", "y")
      .select("auc").as[Double].head()
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val pairSum = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    assert(math.abs(auc - pairSum / (pos.size * neg.size)) < 1e-12)
  }

  test("ev5 anomalousDays: a spike day z-scores out; zero-variance types drop") {
    val DayNs = 86400000000000L
    // type "a": 9 days of 10 events + 1 day of 100 → that day is anomalous.
    val calm = for (d <- 0L until 9L; i <- 0 until 10)
      yield ("a", d * DayNs + i * 1000L)
    val spike = (0 until 100).map(i => ("a", 9L * DayNs + i * 1000L))
    // type "b": constant 5/day → σ=0 → no rows even though |z| is undefined.
    val flat = for (d <- 0L until 10L; i <- 0 until 5)
      yield ("b", d * DayNs + i * 1000L)
    val ev = (calm ++ spike ++ flat).toDF("event_type", "ts")
    val got = EventAnalytics.anomalousDays(ev, "event_type", "ts", z = 2.0)
      .collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "a" && got.head.getLong(1) == 9L
      && got.head.getLong(2) == 100L)
    assert(got.head.getDouble(3) > 2.0)
  }

  test("ev6 transitions: probabilities per source sum to 1; ts ties break by id") {
    val ev = Seq(
      // user 1: a → b → a  (pairs: a→b, b→a)
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 300L, 3L, "a"),
      // user 2: a → a (equal ts — id order decides), then → c
      (2L, 100L, 10L, "a"), (2L, 100L, 11L, "a"), (2L, 400L, 12L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(("a", "b")) == (1L, 0.333333))
    assert(got(("a", "a")) == (1L, 0.333333))
    assert(got(("a", "c")) == (1L, 0.333333))
    assert(got(("b", "a")) == (1L, 1.0))
    val bySrc = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    bySrc.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-3) }
  }

  test("t6 splitSentences: terminators kept, whitespace consumed, empties drop") {
    val docs = Seq(
      (1L, "First one. Second two!  Third three? tail without terminator"),
      (2L, "No terminator at all"),
      (3L, "")).toDF("doc_id", "text")
    val got = Chunker.splitSentences(docs, "doc_id", "text")
      .orderBy("id", "sent_idx")
      .select("id", "sent_idx", "sentence").as[(String, Int, String)].collect().toSeq
    assert(got == Seq(
      ("1", 0, "First one."), ("1", 1, "Second two!"), ("1", 2, "Third three?"),
      ("1", 3, "tail without terminator"),
      ("2", 0, "No terminator at all")))
  }

  test("b8 BooleanRetrieval: AND needs every term, NOT excludes, dups absorbed") {
    val postings = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // doc 1: x y (x twice)
      (2L, "x"),                       // doc 2: x only
      (3L, "x"), (3L, "y"), (3L, "z")) // doc 3: x y z
      .toDF("doc_id", "term")
    val got = BooleanRetrieval.retrieve(postings, "doc_id", "term",
      must = Seq("x", "y"), mustNot = Seq("z"))
      .as[Long].collect().toSet
    assert(got == Set(1L)) // 2 misses y; 3 banned by z; 1's dup x counts once
    val noBan = BooleanRetrieval.retrieve(postings, "doc_id", "term",
      must = Seq("x", "y"))
      .as[Long].collect().toSet
    assert(noBan == Set(1L, 3L))
  }

  test("d17 pairQuality: canonicalizes orientation, exact counts, null guards") {
    val cand = Seq((2L, 1L), (1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (4L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Dedup.pairQuality(cand, truth).collect().head
    // cand canon = {(1,2),(3,4),(5,6)}; truth = {(1,2),(3,4),(7,8)}; tp = 2.
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 3L, 2L))
    assert(r.getDouble(3) == 0.666667 && r.getDouble(4) == 0.666667)
    assert(r.getDouble(5) == 0.666667)
    // Empty truth: recall/f1 NULL, precision still defined.
    val empty = truth.filter(col("id_a") < 0)
    val r2 = Dedup.pairQuality(cand, empty).collect().head
    assert(r2.getLong(1) == 0L && r2.isNullAt(4) && r2.isNullAt(5))
    assert(r2.getDouble(3) == 0.0)
  }

  test("d17 shared-shingle signatures equal the direct text-path signatures") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val direct = Dedup.minhashSignatures(docs, "doc_id", "text",
      numHashes = 4, shingleSize = 3).orderBy("id").collect().toSeq
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3).distinct()
    val shared = Dedup.minhashSignaturesFromShingles(sh, numHashes = 4)
      .orderBy("id").collect().toSeq
    assert(direct == shared) // min() idempotence: distinct frame signs identically
  }

  test("m9 bootstrapCi: constant metric collapses the interval to the point") {
    val perQ = (1 to 30).map(i => (s"q$i", 0.8)).toDF("question_id", "v")
    val r = graft.eval.Recall.bootstrapCi(perQ, "question_id", "v", reps = 50)
      .collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 50L)
    assert(r.getDouble(2) == 0.8 && r.getDouble(3) == 0.8 && r.getDouble(4) == 0.8)
  }

  test("m9 bootstrapCi: deterministic across runs, interval brackets the mean") {
    val perQ = (1 to 40).map(i => (f"q$i%02d", if (i % 4 == 0) 0.0 else 1.0))
      .toDF("question_id", "v")
    val a = graft.eval.Recall.bootstrapCi(perQ, "question_id", "v", reps = 100)
      .collect().head
    val b = graft.eval.Recall.bootstrapCi(perQ, "question_id", "v", reps = 100)
      .collect().head
    assert(a == b) // hash-deterministic resampling — no RNG stream, no seed state
    assert(a.getDouble(3) <= a.getDouble(2) && a.getDouble(2) <= a.getDouble(4))
    assert(a.getDouble(3) < a.getDouble(4)) // non-degenerate metric → real width
  }

  test("x31 readability signals: sentence/syllable counts on a known text") {
    import graft.functions.{Norm, TextAnalysis => TAF}
    val docs = Seq(
      (1L, "The cat sat. The dog ran! Did it?"),
      (2L, ""),
      (3L, "word")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TAF.sentenceCount(col("text")).as("s"),
        TAF.syllableCountNorm(Norm.normPhrase(col("text"))).as("y"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) == ((3, 8))) // 3 sentences; 8 words, each one vowel group
    assert(got(2L) == ((0, 0)))
    assert(got(3L) == ((1, 1)))
  }

  test("x32 pearsonMatrix: known correlations, constant column yields NULL") {
    import graft.operators.CorpusOps
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0))
      .toDF("a", "b", "c", "k")
    val got = CorpusOps.pearsonMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(math.round(r.getDouble(2) * 1e9) / 1e9)))
      .toMap
    assert(got.size == 6) // 4 choose 2 pairs, one aggregate pass
    assert(got(("a", "b")) == Some(1.0)) // b = 2a
    assert(got(("a", "c")) == Some(-1.0)) // c = -a
    assert(got(("b", "c")) == Some(-1.0))
    assert(got(("a", "k")) == None) // zero variance → NULL, not corr=0
  }

  test("er3 survivorship: modal value wins, ties to min, all-null attr stays null") {
    import graft.operators.CorpusOps
    val members = Seq(
      (10L, 1L, "en", "feedA"), (10L, 2L, "en", "feedB"), (10L, 3L, "de", null),
      (20L, 4L, "fr", null), (20L, 5L, "es", null)) // lang tie → min ("es")
      .toDF("rep_id", "doc_id", "lang", "source")
    val got = CorpusOps.survivorship(members, "rep_id", "doc_id", Seq("lang", "source"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), Option(r.getString(3)))).toMap
    assert(got(10L) == ((3L, "en", Some("feedA")))) // en 2-1; source tie feedA<feedB
    assert(got(20L) == ((2L, "es", None))) // tie → min; source all null stays null
  }

  test("g23 conductance: two bridged triangles, isolated community NULL") {
    import graft.operators.LabelPropagation
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B"), (7L, "C")).toDF("id", "label")
    val got = LabelPropagation.conductance(labels, edges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // vol(A) = 6 intra-directed + 1 bridge out = 7; cut = 1; φ = 1/7.
    assert(got("A") == ((3L, 7L, 1L, Some(1.0 / 7))))
    assert(got("B") == ((3L, 7L, 1L, Some(1.0 / 7))))
    assert(got("C") == ((1L, 0L, 0L, None))) // no volume to leak → undefined
  }

  test("g24 assortativity building blocks: star graph is exactly -1, ring is NULL") {
    import graft.operators.CorpusOps
    // star: hub 0 to leaves 1..4, both directions. Degree pairs are (4,1)
    // and (1,4) — perfect anti-correlation.
    val und = (1L to 4L).map(l => (0L, l))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
    val pairs = edges
      .join(deg.select(col("id").as("src"), col("_d").as("du")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("_d").as("dv")), Seq("dst"))
      .select(col("du").cast("double").as("du"), col("dv").cast("double").as("dv"))
    val r = CorpusOps.pearsonMatrix(pairs, Seq("du", "dv")).collect().head
    assert(r.getDouble(2) == -1.0) // exact: integer moments, no float noise
    // ring: every degree 2 → zero variance → NULL, not 0
    val ringU = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val ring = ringU.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val rdeg = ring.groupBy(col("src").as("id")).agg(count(lit(1)).as("_d"))
    val rp = ring
      .join(rdeg.select(col("id").as("src"), col("_d").as("du")), Seq("src"))
      .join(rdeg.select(col("id").as("dst"), col("_d").as("dv")), Seq("dst"))
      .select(col("du").cast("double").as("du"), col("dv").cast("double").as("dv"))
    assert(CorpusOps.pearsonMatrix(rp, Seq("du", "dv")).collect().head.isNullAt(2))
  }

  test("x33 threshold curve: counts are monotone non-increasing in the threshold") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "alpha beta gamma delta other words here now"), // mid overlap
      (4L, "completely different content with no shared shingles at all"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleSize = 3, minJaccard = 0.1)
    val byTh = Seq(0.1, 0.3, 0.6).map { th =>
      th -> pairs.filter(col("jaccard") >= th).count()
    }
    assert(byTh.map(_._2) == byTh.map(_._2).sorted.reverse) // monotone
    assert(byTh.head._2 >= 2) // 1~2 strongly, 1~3/2~3 weakly
    assert(byTh.last._2 >= 1) // the near-dup pair survives a high cut
  }

  test("cs8 weightedQuantiles: mass cuts differ from count cuts by construction") {
    import graft.operators.CorpusOps
    // 9 docs of length 10 (weight 1 each) + 1 doc of length 1000 carrying
    // weight 991: count-median is 10, but half the MASS is in the giant.
    val rows = (1 to 9).map(_ => (10L, 1L)) :+ ((1000L, 991L))
    val df = rows.toDF("len", "toks")
    val got = CorpusOps.weightedQuantiles(df, "len", "toks", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.5) == 1000L) // weighted median = the giant
    assert(got(0.9) == 1000L)
    val count = CorpusOps.weightedQuantiles(
        df.withColumn("one", lit(1L)), "len", "one", Seq(0.5))
      .collect().head.getLong(1)
    assert(count == 10L) // unweighted median — the divergence cs8 exists to expose
  }

  test("ev7 decayedCounts: recency outweighs raw volume; exact half-life steps") {
    val DayNs = 86400000000000L
    // "old": 4 events 2 days ago → 4 * 2^-2 = 1.0 decayed.
    // "new": 2 events at T → 2.0 decayed. Raw count orders old > new,
    // decayed orders new > old.
    val ev = ((1 to 4).map(i => ("old", 0L + i)) ++ Seq(("new", 2L * DayNs), ("new", 2L * DayNs)))
      .toDF("event_type", "ts")
    val got = graft.operators.EventAnalytics
      .decayedCounts(ev, "event_type", "ts", halfLifeDays = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("new")._1 == 2L && got("new")._2 == 2.0)
    assert(got("old")._1 == 4L)
    assert(math.abs(got("old")._2 - 1.0) < 1e-9) // ts offsets of a few ns ≈ exact
    assert(got("new")._2 > got("old")._2)
  }
}
