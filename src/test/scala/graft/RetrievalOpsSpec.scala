package graft

import graft.operators.{CorpusOps, FuzzyMatch, MultiVector, TfIdf}
import org.apache.spark.sql.functions._

/** TF-IDF retrieval, MaxSim late interaction, fuzzy matching, weighted
  * sampling. */
class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------------- tf-idf
  test("tfidf weights: L2-normalized per doc; ubiquitous terms carry zero weight") {
    val docs = Seq(
      ("a", "apple apple banana common"),
      ("b", "banana cherry common"),
      ("c", "cherry cherry cherry common")).toDF("id", "text")
    val w = TfIdf.weights(docs, "id", "text")
      .as[(String, String, Double)].collect()
    val byDoc = w.groupBy(_._1)
    // every doc's surviving weights sum to 1 in L2
    byDoc.foreach { case (d, rows) =>
      assert(math.abs(rows.map(r => r._3 * r._3).sum - 1.0) < 1e-9, s"doc $d")
    }
    // 'common' is in all docs: idf = ln(1) = 0 — present but weightless
    assert(w.filter(_._2 == "common").forall(_._3 == 0.0))
    // maxDf cut removes it entirely
    val cut = TfIdf.weights(docs, "id", "text", maxDfFraction = 0.9)
      .as[(String, String, Double)].collect()
    assert(!cut.exists(_._2 == "common"))
  }

  test("tfidf topK: a doc is its own best match; disjoint docs score nothing") {
    val docs = Seq(
      ("1", "apple banana apple"),
      ("2", "cherry date cherry"),
      ("3", "apple banana apple")).toDF("id", "text")
    val w = TfIdf.weights(docs, "id", "text")
    val got = TfIdf.topK(w, docs.filter($"id" === "1"), "id", "text", 3)
      .as[(String, Int, String, Double)].collect().sortBy(_._2)
    // docs 1 and 3 are identical: tied rounded score, id ascending
    assert(got.map(_._3).toSeq == Seq("1", "3"))
    assert(got(0)._4 == got(1)._4)
  }

  // -------------------------------------------------------------------- maxsim
  test("maxsim: picks per-query-token best doc token, sums over query tokens") {
    val dToks = Seq(
      ("d1", Seq(1f, 0f)), ("d1", Seq(0f, 1f)), // d1 covers both axes
      ("d2", Seq(1f, 0f)), ("d2", Seq(1f, 0f))  // d2 only axis 0
    ).toDF("did", "v")
    val qToks = Seq(
      ("q", 0, Seq(1f, 0f)), ("q", 1, Seq(0f, 1f))).toDF("qid", "tok", "v")
    val got = MultiVector.maxSimTopK(qToks, dToks, "qid", "tok", "v", "did", "v", 2)
      .as[(String, Int, String, Double)].collect().sortBy(_._2)
    // d1: 1 + 1 = 2; d2: 1 + 0 = 1
    assert(got.map(r => (r._3, r._4)).toSeq == Seq(("d1", 2.0), ("d2", 1.0)))
  }

  test("maxsim: k bounds output; rounded-score ties break by doc id") {
    val dToks = Seq(("a", Seq(1f)), ("b", Seq(1f)), ("c", Seq(0.5f))).toDF("did", "v")
    val qToks = Seq(("q", 0, Seq(1f))).toDF("qid", "tok", "v")
    val got = MultiVector.maxSimTopK(qToks, dToks, "qid", "tok", "v", "did", "v", 2)
      .as[(String, Int, String, Double)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq("a", "b"))
  }

  // ------------------------------------------------------------ fuzzy matching
  test("fuzzy match: exact hit ranks first, typos within maxDist, cutoffs apply") {
    val dict = Seq("einstein", "einsteins", "newton", "curie")
      .toDF("name").withColumn("id", col("name"))
    val probes = Seq(("p1", "einstein"), ("p2", "einstien"), ("p3", "xxxxxxxx"))
      .toDF("pid", "s")
    val got = FuzzyMatch.topKByEditDistance(dict, "id", "name",
        probes, "pid", "s", maxDist = 2, k = 2)
      .as[(String, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(got("p1") == Seq(("einstein", 0), ("einsteins", 1)))
    // transposition = 2 edits under plain Levenshtein
    assert(got("p2").head == ("einstein", 2))
    assert(!got.contains("p3")) // nothing within range emits nothing
  }

  test("blocked entity resolution: exact dups collapse to multiplicity, typos pair, cross-block escapes") {
    val ents = Seq(
      (1L, "goldenrod lace"), (2L, "goldenrod lac"),   // 1 edit, same block
      (3L, "goldenrod lace"),                          // exact dup: folds into id 1's count
      (4L, "xoldenrod lace"),                          // 1 edit INSIDE prefix -> other block
      (5L, "silver spring"), (6L, "silver sprinkle")   // 3 edits: beyond maxEdit=2
    ).toDF("id", "name")
    val got = FuzzyMatch.blockedNearDupPairs(ents, "id", "name", prefixLen = 4, maxEdit = 2)
      .as[(Long, Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // ONE pair of distinct strings: rep ids (1, 2), the exact copy (id 3)
    // appears as n_a = 2, never as its own distance-0 rows
    assert(got == Map((1L, 2L) -> ((1, 2L, 1L))), got)
    // the blocking tradeoff is explicit: id 4 is 1 edit from 1 but unblocked
    assert(!got.contains((1L, 4L)))
  }

  test("resolution clusters: transitive chains collapse to min id, exact dups follow, loners keep themselves") {
    val ents = Seq(
      (10L, "aaaa x"), (11L, "aaaa xy"), (12L, "aaaa xyz"), (13L, "aaaa xyzw"),
      // 10~13 is distance 3 (> maxEdit): reachable ONLY transitively
      (14L, "aaaa x"),        // exact dup of 10: collapses, then follows 10
      (20L, "silver spring")) // no pair anywhere: canon = itself
      .toDF("id", "name")
    val got = FuzzyMatch.resolutionClusters(ents, "id", "name",
        prefixLen = 4, maxEdit = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      14L -> 10L, 20L -> 20L), got)
  }

  test("spellCorrect: OOV terms ranked by (dist, freq, term); in-vocab emit nothing") {
    val vocab = Seq(("customer", 50L), ("customs", 10L), ("cluster", 5L))
      .toDF("token", "cnt")
    val q = Seq(("p1", "custmer customer")).toDF("qid", "qtext")
    val got = FuzzyMatch.spellCorrect(vocab, "token", "cnt", q, "qid", "qtext",
        maxDist = 2, k = 3)
      .as[(String, String, Int, String, Int, Long)].collect().sortBy(_._3)
    // only the OOV 'custmer' is corrected; 'customer' (in vocab) is silent
    assert(got.forall(_._2 == "custmer"), got.toSeq)
    assert(got.head._4 == "customer" && got.head._5 == 1) // one dropped 'o'
    // distance beats frequency; among equal distances higher freq first
    assert(got.map(_._4).toSeq == got.sortBy(r => (r._5, -r._6, r._4)).map(_._4).toSeq)
  }

  test("snippets: densest window wins, ties earliest, no-hit docs absent") {
    import graft.operators.Snippets
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "nothing relevant here at all"),
      (3L, "delta delta delta")).toDF("doc_id", "text")
    val q = Seq(("q", "alpha delta")).toDF("qid", "qtext")
    val got = Snippets.bestWindow(docs, "doc_id", "text", q, "qid", "qtext",
        width = 4)
      .select("doc_id", "start_pos", "n_terms", "snippet")
      .as[(Long, Int, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1: windows at 1 {alpha,delta} and 4 {delta,alpha} both cover 2 —
    // earliest start wins; snippet = tokens 1..4
    assert(got(1L) == ((1L, 1, 2L, "alpha beta gamma delta")), got(1L))
    // doc 3: only one distinct term however many hits; window clips at end
    assert(got(3L)._3 == 1L && got(3L)._2 == 1)
    assert(!got.contains(2L))
  }

  // ---------------------------------------------------------- negative sampling
  test("negative sampling: exactly k draws per anchor, weight-biased, stable") {
    val items = Seq(("common", 90L), ("rare", 5L), ("mid", 5L)).toDF("item", "w")
    val anchors = (1 to 50).map(i => s"a$i").toDF("aid")
    val got = CorpusOps.negativeSample(anchors, "aid", items, "item", "w", k = 4)
      .as[(String, Int, String)].collect()
    assert(got.length == 50 * 4)
    assert(got.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)))
    val freq = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(freq("common") > 140, freq.toString) // ~90% of 200 draws
    // deterministic under repartition
    val again = CorpusOps.negativeSample(anchors.repartition(7), "aid",
        items.repartition(3), "item", "w", k = 4)
      .as[(String, Int, String)].collect().toSet
    assert(again == got.toSet)
  }

  // ---------------------------------------------------------- weighted sampling
  test("weighted sample: deterministic, k-bounded, weight-biased") {
    val rows = (1 to 400).map(i => (i.toString, if (i <= 200) 1.0 else 100.0))
    val df = rows.toDF("id", "w")
    val s1 = CorpusOps.weightedSample(df, "id", "w", 50).as[(String, Double)].collect()
    val s2 = CorpusOps.weightedSample(df.repartition(7), "id", "w", 50)
      .as[(String, Double)].collect()
    assert(s1.map(_._1).toSet == s2.map(_._1).toSet) // repartition-stable
    assert(s1.length == 50)
    // heavy rows (w=100, half the population) must dominate the sample
    val heavy = s1.count(_._2 == 100.0)
    assert(heavy > 40, s"expected heavy-weight dominance, got $heavy/50")
  }
}
