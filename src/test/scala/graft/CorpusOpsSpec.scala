package graft

import graft.operators.{CorpusOps, Dedup}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- packSequences

  test("packSequences matches a single-partition cumulative reference") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i => (f"doc$i%04d", rnd.nextInt(300).toLong))
    val df = rows.toDF("id", "n").repartition(7) // deliberately scrambled
    val got = CorpusOps.packSequences(df, "id", "n", seqLen = 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)

    var off = 0L
    val want = rows.sortBy(_._1).map { case (id, n) =>
      val start = off; off += n
      val first = start / 128
      val last = math.max(first, (start + n - 1) / 128)
      (id, n, start, first, last)
    }
    assert(got.toSeq == want)
  }

  test("packSequences is invariant to input partitioning and handles empty/zero docs") {
    val rows = Seq(("a", 0L), ("b", 100L), ("c", 0L), ("d", 200L), ("e", 50L))
    val a = CorpusOps.packSequences(rows.toDF("id", "n"), "id", "n", 64)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = CorpusOps.packSequences(rows.toDF("id", "n").repartition(5), "id", "n", 64)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
    // zero-token doc sits at its offset with seq_first == seq_last
    val aRow = a.find(_.head == "a").get
    assert(aRow(2) == 0L && aRow(3) == aRow(4))
    // empty input yields empty output, no crash
    assert(CorpusOps.packSequences(
      Seq.empty[(String, Long)].toDF("id", "n"), "id", "n", 64).count() == 0)
  }

  // ---------------------------------------------------------- connectedComponents

  test("connectedComponents equals brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 40
      val pairs = (0 until 50).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (f"v${math.min(a, b)}%02d", f"v${math.max(a, b) + (if (a == b) 1 else 0)}%02d")
      }.distinct
      val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap

      // reference union-find
      val parent = scala.collection.mutable.Map[String, String]()
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("connectedComponents collapses a transitive chain to one representative") {
    val pairs = Seq(("b", "c"), ("a", "b"), ("c", "d"), ("x", "y")).toDF("id_a", "id_b")
    val reps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("a", "b", "c", "d").forall(reps(_) == "a"))
    assert(reps("x") == "x" && reps("y") == "x")
  }

  test("connectedComponents handles a 100-node path deeper than maxIter (star fallback)") {
    // Diameter 99 ≫ the default maxIter=20 label-propagation bound: the call
    // must hand off to the O(log n)-round star algorithm, not throw and not
    // return a split clustering.
    val pairs = (0 until 99).map(i => (f"n$i%03d", f"n${i + 1}%03d")).toDF("id_a", "id_b")
    val reps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reps.size == 100)
    assert(reps.values.forall(_ == "n000"), reps.values.toSet.take(5))
  }

  test("connectedComponentsStars matches union-find on a large chained graph") {
    // 400 nodes: random edges PLUS several 60-node chains (deep diameter —
    // the regime the star algorithm exists for), vs brute-force union-find
    val rnd = new scala.util.Random(71)
    val chainPairs = (0 until 5).flatMap { c =>
      (0 until 59).map(i => (f"c$c%01d_${i}%03d", f"c$c%01d_${i + 1}%03d"))
    }
    val randPairs = (0 until 120).map { _ =>
      val a = rnd.nextInt(200); val b = rnd.nextInt(200)
      (f"r$a%03d", f"r${if (a == b) (b + 1) % 200 else b}%03d")
    }
    val pairs = (chainPairs ++ randPairs).distinct
    val got = Dedup.connectedComponentsStars(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got == want)
  }

  test("connectedComponentsStars equals label propagation on random graphs") {
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val n = 40
      val pairs = (0 until 45).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (f"v${math.min(a, b)}%02d", f"v${math.max(a, b) + (if (a == b) 1 else 0)}%02d")
      }.distinct.toDF("id_a", "id_b")
      val viaStars = Dedup.connectedComponentsStars(pairs)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val viaProp = Dedup.connectedComponents(pairs, maxIter = 40)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(viaStars == viaProp, s"trial $trial")
    }
  }

  // ------------------------------------------------------------ scrubHotNgrams

  test("scrubHotNgrams drops exactly the tokens covered by hot n-grams") {
    // "a b c" appears 3× (> 2) — every token of every occurrence must go;
    // the unique tails survive in original order
    val docs = Seq(
      ("d1", Seq("a", "b", "c", "x1")),
      ("d2", Seq("y0", "a", "b", "c", "y1")),
      ("d3", Seq("a", "b", "c")),
      ("d4", Seq("z0", "z1"))).toDF("doc_id", "toks")
    val out = CorpusOps.scrubHotNgrams(docs, "doc_id", "toks", n = 3, maxOccurrences = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("d1") == (1L, "x1"))
    assert(out("d2") == (2L, "y0 y1"))
    assert(!out.contains("d3"), "fully-covered doc must vanish")
    assert(out("d4") == (2L, "z0 z1"), "short docs (< n tokens) untouched")
  }

  test("scrubHotNgrams with a high threshold is the identity (minus empty docs)") {
    val docs = Seq(("d1", Seq("a", "b", "c", "d")), ("d2", Seq.empty[String]))
      .toDF("doc_id", "toks")
    val out = CorpusOps.scrubHotNgrams(docs, "doc_id", "toks", n = 2, maxOccurrences = 100)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("d1" -> "a b c d"))
  }

  // -------------------------------------------- scrubHotNgrams property check

  test("scrubHotNgrams equals an independent reference on random corpora") {
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 3) {
      val vocab = Vector("a", "b", "c", "d")
      val docs = (0 until 30).map { i =>
        (s"d$i", Vector.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
      }
      val n = 2
      val maxOcc = 3L
      // reference: count overlapping n-grams, mark covered positions, rebuild
      val gramCounts = scala.collection.mutable.Map[String, Long]()
      docs.foreach { case (_, toks) =>
        toks.sliding(n).filter(_.size == n)
          .foreach(g => gramCounts(g.mkString(" ")) =
            gramCounts.getOrElse(g.mkString(" "), 0L) + 1)
      }
      val hot = gramCounts.filter(_._2 > maxOcc).keySet
      val want = docs.flatMap { case (id, toks) =>
        val covered = Array.fill(toks.size)(false)
        toks.sliding(n).zipWithIndex.foreach { case (g, s) =>
          if (g.size == n && hot(g.mkString(" ")))
            (s until s + n).foreach(covered(_) = true)
        }
        val kept = toks.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        if (kept.isEmpty) None else Some(id -> (kept.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = CorpusOps.scrubHotNgrams(
          docs.toDF("id", "toks"), "id", "toks", n, maxOcc)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == want, s"trial $trial")
    }
  }

  // ------------------------------------------------------ deterministicShuffle

  test("deterministicShuffle: a permutation, seed-dependent, repartition-stable") {
    val df = (0 until 300).map(i => Tuple1(s"d$i")).toDF("id")
    def order(d: org.apache.spark.sql.DataFrame, seed: String) =
      CorpusOps.deterministicShuffle(d, "id", seed)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = order(df, "ep1")
    assert(a.values.toSeq.sorted == (1L to 300L), "positions must be a permutation")
    assert(order(df.repartition(7), "ep1") == a, "same seed must reproduce")
    val b = order(df, "ep2")
    assert(a != b, "different seeds must give different epoch orders")
    // and it is not the identity order
    assert((1 to 10).exists(i => a(s"d$i") != i + 1L))
  }

  // ------------------------------------------------------- bigramLogPerplexity

  test("bigramLogPerplexity: scrambled word order scores worse than fluent order") {
    // corpus dominated by "a b" bigrams; d_bad uses the same words reversed
    val docs = (
      (0 until 10).map(i => (s"f$i", Seq("a", "b", "a", "b", "a", "b"))) ++
      Seq(("bad", Seq("b", "a", "b", "a", "b", "a")),
          ("tiny", Seq("a")), ("empty", Seq.empty[String]))).toDF("id", "toks")
    val out = CorpusOps.bigramLogPerplexity(docs, "id", "toks")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("bad") > out("f0"), s"scrambled must score worse: $out")
    assert(!out.contains("tiny") && !out.contains("empty"),
      "docs with < 2 tokens have no bigram to score")
    // hand-check one value: corpus c("a b")=31, c("b a")=25... verify via the
    // definition instead of magic numbers
    val allPairs = (0 until 10).flatMap(_ => Seq("a b", "a b", "a b", "b a", "b a")) ++
      Seq("b a", "b a", "b a", "a b", "a b")
    val c2 = allPairs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = Map("a" -> 34.0, "b" -> 33.0) // corpus token counts incl. "tiny"
    val v = 2.0
    def p(pair: String) = (c2(pair) + 1.0) / (c1(pair.split(" ").head) + v)
    val want = -(math.log(p("a b")) * 3 + math.log(p("b a")) * 2) / 5
    assert(math.abs(out("f0") - want) < 1e-9, s"${out("f0")} vs $want")
  }

  // ------------------------------------------------------------ temperatureMix

  test("temperatureMix: alpha=1 keeps natural proportions, alpha=0.5 upsamples rare") {
    val rows = (0 until 900).map(i => (s"d$i", "big")) ++
      (900 until 1000).map(i => (s"d$i", "small"))
    val df = rows.toDF("id", "source")
    def keptBySource(alpha: Double, budget: Long): Map[String, Long] =
      CorpusOps.temperatureMix(df, "id", "source", alpha, budget)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=1: p_s = n_s/N → every source keeps ~budget/N of its rows
    val nat = keptBySource(1.0, 500L)
    val natRatio = nat("big").toDouble / nat.getOrElse("small", 0L).max(1L)
    assert(natRatio > 4.0, s"natural mix must stay big-heavy: $nat")
    // alpha=0.5: sqrt weights → small's share triples (sqrt(900):sqrt(100)=3:1)
    val flat = keptBySource(0.5, 500L)
    val flatRatio = flat("big").toDouble / flat("small")
    assert(flatRatio < natRatio, s"temperature must flatten: $flat vs $nat")
    // rate cap: a huge budget keeps everything
    val all = keptBySource(0.5, 1000000L)
    assert(all == Map("big" -> 900L, "small" -> 100L))
  }

  test("temperatureMix keep-set equals the reference rate computation") {
    // independent recomputation of bps per source + the md5 bucket decision
    val rows = (0 until 400).map(i => (s"d$i", s"s${i % 3}"))
    val df = rows.toDF("id", "source")
    val budget = 200L
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val z = counts.values.map(c => math.sqrt(c.toDouble)).sum
    val bps = counts.map { case (s, c) =>
      s -> math.min(10000L,
        math.floor(budget.toDouble * math.sqrt(c.toDouble) / z / c * 10000.0).toLong)
    }
    def bucket(id: String): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id).substring(0, 8), 16) % 10000
    val want = rows.collect { case (id, s) if bucket(id) < bps(s) => id }.toSet
    val got = CorpusOps.temperatureMix(df, "id", "source", 0.5, budget)
      .select("id").collect().map(_.getString(0)).toSet
    assert(got == want)
  }

  test("temperatureMix membership is a pure row property (repartition-stable)") {
    val df = (0 until 300).map(i => (s"d$i", s"s${i % 3}")).toDF("id", "source")
    val a = CorpusOps.temperatureMix(df, "id", "source", 0.5, 150L)
      .select("id").collect().map(_.getString(0)).toSet
    val b = CorpusOps.temperatureMix(df.repartition(7), "id", "source", 0.5, 150L)
      .select("id").collect().map(_.getString(0)).toSet
    assert(a == b)
  }

  // --------------------------------------------------------------- equalizeStrata

  test("equalizeStrata caps large strata near the smallest, keeps smallest whole") {
    val rows = (0 until 900).map(i => (s"d$i", "en")) ++
      (900 until 1000).map(i => (s"d$i", "fr"))
    val kept = CorpusOps.equalizeStrata(rows.toDF("id", "lang"), "id", "lang")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fr: bps = 10000 => all 100 kept; en: bps = 100*10000 div 900 = 1111
    assert(kept("fr") == 100L)
    assert(kept("en") > 50L && kept("en") < 200L, kept("en")) // ~111 expected
    // deterministic: a second run keeps the exact same ids
    val ids1 = CorpusOps.equalizeStrata(rows.toDF("id", "lang"), "id", "lang")
      .select("id").collect().map(_.getString(0)).toSet
    val ids2 = CorpusOps.equalizeStrata(rows.toDF("id", "lang").repartition(9), "id", "lang")
      .select("id").collect().map(_.getString(0)).toSet
    assert(ids1 == ids2)
  }

  // ------------------------------------------------------------------- vocabulary

  test("vocabulary: frequency floor, deterministic tie order at the cut") {
    val docs = Seq(
      Seq("a", "b", "b", "c"), Seq("b", "c", "d"), Seq("c", "d", "e"))
      .toDF("toks")
    val v = CorpusOps.vocabulary(docs, "toks", minCount = 2, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts: b=3, c=3, d=2, a=1, e=1 → floor 2 keeps b,c,d; ties b<c
    assert(v.toSeq == Seq(("b", 3L), ("c", 3L), ("d", 2L)))
    val v2 = CorpusOps.vocabulary(docs, "toks", minCount = 2, topK = 2)
      .collect().map(_.getString(0))
    assert(v2.toSeq == Seq("b", "c")) // cut at k pinned by token order
  }

  // ---------------------------------------------------------- selectByTokenBudget

  test("selectByTokenBudget: greedy by score, prefix-window cut, repartition-stable") {
    val rows = Seq(
      // (id, score, n): sorted by (score desc, id) => d3(0.9,50) d1(0.8,100)
      //                  d4(0.8,400) d2(0.5,60) d5(0.1,10)
      ("d1", 0.8, 100L), ("d2", 0.5, 60L), ("d3", 0.9, 50L),
      ("d4", 0.8, 400L), ("d5", 0.1, 10L)).toDF("id", "score", "n")
    val kept = CorpusOps.selectByTokenBudget(rows, "id", "score", "n", budget = 250L)
      .select("id").as[String].collect().toSet
    // prefix: d3@0+50 ok; d1@50+100 ok; d4@150+400 > 250 skipped;
    // d2@550... prefix counts ALL sorted-before rows: d2's prefix = 550 > 250
    assert(kept == Set("d3", "d1"))
    // tight budget admits only the best doc; zero budget admits none
    assert(CorpusOps.selectByTokenBudget(rows, "id", "score", "n", 50L)
      .select("id").as[String].collect().toSet == Set("d3"))
    assert(CorpusOps.selectByTokenBudget(rows, "id", "score", "n", 10L).isEmpty)
    // invariant under input partitioning
    val kept2 = CorpusOps.selectByTokenBudget(
      rows.repartition(5), "id", "score", "n", 250L)
      .select("id").as[String].collect().toSet
    assert(kept2 == kept)
  }

  // --------------------------------------------------------- unigramLogPerplexity

  test("unigramLogPerplexity: rare-token docs score higher; matches hand calc") {
    val docs = Seq(
      ("common", Seq("a", "a", "b")),
      ("rare", Seq("z", "q", "b")),
      ("empty", Seq.empty[String])).toDF("id", "toks")
    val got = CorpusOps.unigramLogPerplexity(docs, "id", "toks")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // corpus: a=2, b=2, z=1, q=1, total=6
    val expCommon = -(math.log(2 / 6.0) + math.log(2 / 6.0) + math.log(2 / 6.0)) / 3
    val expRare = -(math.log(1 / 6.0) + math.log(1 / 6.0) + math.log(2 / 6.0)) / 3
    assert(math.abs(got("common") - expCommon) < 1e-12)
    assert(math.abs(got("rare") - expRare) < 1e-12)
    assert(got("rare") > got("common"))
    assert(!got.contains("empty")) // no tokens => no score
  }

  test("scoreLinear: tf-weighted sum + bias; unweighted and empty docs score bias") {
    val docs = Seq(
      (1L, Seq("a", "a", "b")),   // 2*w(a) + 1*w(b)
      (2L, Seq("zzz")),           // no weighted token -> bias only
      (3L, Seq.empty[String])     // empty -> bias only
    ).toDF("doc_id", "toks")
    val model = Seq(("a", 2.0), ("b", -1.0)).toDF("token", "w")
    val got = CorpusOps.scoreLinear(docs, "doc_id", "toks", model, "token", "w", bias = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 3.5, 2L -> 0.5, 3L -> 0.5), got)
  }

  test("scoreLinear sums duplicate model rows instead of fanning out the join") {
    val docs = Seq((1L, Seq("a", "a"))).toDF("doc_id", "toks")
    val model = Seq(("a", 2.0), ("a", 3.0)).toDF("token", "w") // concatenated tables
    val got = CorpusOps.scoreLinear(docs, "doc_id", "toks", model, "token", "w")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0), got) // tf=2 × (2+3), NOT tf rows duplicated
  }

  test("bloomDecontaminate rejects mismatched key types (silent-false-negative trap)") {
    val corpus = Seq((1L, 5L)).toDF("id", "key")       // BIGINT key
    val evalSet = Seq("5").toDF("k")                   // STRING key
    val e = intercept[IllegalArgumentException] {
      CorpusOps.bloomDecontaminate(corpus, "key", evalSet, "k")
    }
    assert(e.getMessage.contains("key types must match"), e.getMessage)
  }

  test("bloomDecontaminate is EXACT at any fpp (false positives re-checked)") {
    // fpp=0.5 makes the sketch tiny and false positives near-certain, so the
    // exact-confirm path is genuinely exercised: the result must still equal
    // the plain anti-join. Corpus includes duplicate keys (both copies must
    // go) and a key equal to none.
    val corpus = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "ccc"), (4L, "ddd"), (5L, "aaa"),
      (6L, "eee"), (7L, "fff"), (8L, "ggg"), (9L, "hhh"), (10L, "iii")
    ).toDF("id", "key")
    val evalSet = Seq("aaa", "ddd", "zzz").toDF("k")
    for (fpp <- Seq(0.5, 0.01)) {
      val got = CorpusOps.bloomDecontaminate(corpus, "key", evalSet, "k", fpp)
        .select("id").as[Long].collect().toSet
      assert(got == Set(2L, 3L, 6L, 7L, 8L, 9L, 10L), s"fpp=$fpp: $got")
    }
  }

  test("hllEstimate: repartition-invariant (mergeable registers), exact on branches") {
    // Mergeability is the sketch's entire point at scale: max-folded
    // registers must give the SAME estimate however rows are partitioned.
    val rows = (0L until 5000L).map(i => (s"g${i % 2}", s"v${i % (if (i % 2 == 0) 40 else 3000)}"))
      .toDF("grp", "value")
    val a = CorpusOps.hllEstimate(rows, Seq("grp"), "value")
      .as[(String, Double)].collect().toMap
    val b = CorpusOps.hllEstimate(rows.repartition(13), Seq("grp"), "value")
      .as[(String, Double)].collect().toMap
    assert(a == b, s"estimate changed under repartition: $a vs $b")
    // even i mod 40 → 20 distinct (small-range correction branch); odd i mod
    // 3000 → 1500 distinct (raw branch). HLL at m=64 has ~13% std error —
    // assert the right ballpark, not bits (the oracle row pins exact values)
    assert(math.abs(a("g0") - 20) / 20 < 0.35, a)
    assert(math.abs(a("g1") - 1500) / 1500 < 0.35, a)
  }

  test("curriculumPhases: proportional cuts, easy first, repartition-invariant") {
    val rows = (0L until 100L).map(i => (i, (100L - i).toDouble)).toDF("id", "score")
    val got = CorpusOps.curriculumPhases(rows, "id", "score", nPhases = 4)
      .as[(Long, Double, Long)].collect()
    assert(got.length == 100)
    val byPhase = got.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
    assert(byPhase.keySet == Set(0L, 1L, 2L, 3L))
    assert(byPhase.values.forall(_.size == 25))
    // phase 0 = the 25 SMALLEST scores (easy first)
    assert(byPhase(0L) == (1L to 25L).map(_.toDouble).toSet, byPhase(0L))
    assert(byPhase(3L) == (76L to 100L).map(_.toDouble).toSet)
    val re = CorpusOps.curriculumPhases(rows.repartition(7), "id", "score", 4)
      .as[(Long, Double, Long)].collect()
    assert(re.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // non-divisible N: phases sized by the rank formula, never off by > 1
    val odd = CorpusOps.curriculumPhases(
      (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "score"), "id", "score", 3)
      .as[(Long, Double, Long)].collect().groupBy(_._3).view.mapValues(_.length).toMap
    assert(odd == Map(0L -> 4, 1L -> 3, 2L -> 3), odd)
  }

  test("lengthBatches: sorted batching, brute-force padding, repartition-invariant") {
    // lengths 100,99,...,1 over ids 0..99; batchSize 10 → batch b holds
    // lengths 100-10b .. 91-10b, max = 100-10b, padding = 0+1+...+9 = 45
    val rows = (0L until 100L).map(i => (i, 100L - i)).toDF("id", "n")
    val got = CorpusOps.lengthBatches(rows, "id", "n", batchSize = 10)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 10)
    got.foreach { case (b, nd, mx, sm, pad) =>
      assert(nd == 10L && mx == 100L - 10 * b && pad == 45L, (b, nd, mx, sm, pad))
    }
    val re = CorpusOps.lengthBatches(rows.repartition(7), "id", "n", batchSize = 10)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq, "batching changed under repartition")
    // ties broken by id: equal lengths split deterministically
    val ties = (0L until 30L).map(i => (i, 7L)).toDF("id", "n")
    val t1 = CorpusOps.lengthBatches(ties, "id", "n", batchSize = 8)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(t1.map(_._2).toSeq == Seq(8L, 8L, 8L, 6L))
    assert(t1.forall(_._5 == 0L)) // all-equal lengths: zero padding
  }

  test("hllOverlapEstimate: inclusion-exclusion tracks true overlap, clamps at 0") {
    // groups share values 0..399 of 1000 each: true overlap 400. One row,
    // estimate within sketch error; exact disjointness clamps to ~0.
    val rows = ((0L until 1000L).map(i => ("a", s"v$i")) ++
      (0L until 1000L).map(i => ("b", s"v${i + 600}"))).toDF("grp", "value")
    val r = CorpusOps.hllOverlapEstimate(rows, "grp", "value", "a", "b")
      .as[(Double, Double, Double, Double)].collect().head
    assert(math.abs(r._1 - 1000) / 1000 < 0.35, r)
    assert(math.abs(r._2 - 1000) / 1000 < 0.35, r)
    assert(math.abs(r._3 - 1600) / 1600 < 0.35, r)
    // overlap inherits all three errors — generous band, sign must be right
    assert(r._4 > 50 && r._4 < 900, r)
    val disjoint = ((0L until 500L).map(i => ("a", s"x$i")) ++
      (0L until 500L).map(i => ("b", s"y$i"))).toDF("grp", "value")
    val d = CorpusOps.hllOverlapEstimate(disjoint, "grp", "value", "a", "b")
      .as[(Double, Double, Double, Double)].collect().head
    assert(d._4 >= 0.0 && d._4 < 200, d) // clamped, near-zero overlap
  }

  test("countMin: one-sided (never under-counts), absent probes report 0") {
    val vals = (0L until 2000L).map(i => Tuple1(s"v${i % 150}")).toDF("v")
    val probes = ((0 until 150 by 7).map(i => s"v$i") :+ "absent").toDF("p")
    val est = CorpusOps.countMinEstimate(vals, "v", probes, "p")
      .as[(String, Long)].collect().toMap
    val exact = vals.groupBy("v").count().as[(String, Long)].collect().toMap
    for ((p, e) <- est if p != "absent")
      assert(e >= exact(p), s"$p: est $e < exact ${exact(p)} — CMS must never under-count")
    assert(est("absent") >= 0L) // collisions may inflate, never error
  }

  test("dsirWeights: target-like docs weigh higher, featureless docs weigh 0") {
    import graft.functions.Norm
    // target domain speaks {alpha, beta}; raw pool speaks {gamma, delta};
    // doc 100 is raw but SOUNDS target-like — resampling should favor it
    val docs = Seq(
      (0L, "alpha beta alpha beta", true), (1L, "beta alpha beta alpha", true),
      (10L, "gamma delta gamma delta", false), (11L, "delta gamma delta", false),
      (12L, "gamma delta gamma", false),
      (100L, "alpha beta alpha", false),
      (101L, "", false))
      .toDF("doc_id", "text", "is_target")
      .select(col("doc_id"), Norm.normTokens(col("text")).as("toks"), col("is_target"))
    val w = CorpusOps.dsirWeights(docs, "doc_id", "toks", "is_target", buckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(0L, 1L, 10L, 11L, 12L, 100L, 101L))
    assert(w(101L) == 0.0, s"empty doc must weigh 0, got ${w(101L)}")
    // the target-sounding raw doc outweighs every genuinely-raw doc
    assert(w(100L) > w(10L) && w(100L) > w(11L) && w(100L) > w(12L), w.toString)
    // and raw-domain docs carry negative log-ratio mass
    assert(w(10L) < 0.0, w.toString)
  }

  test("gumbelTopK: deterministic, repartition-invariant, dominant weight always sampled") {
    val n = 200
    val docs = (1L to n).map(i => (i, if (i == 137L) 100.0 else 0.0)).toDF("doc_id", "lw")
    val pick = (d: org.apache.spark.sql.DataFrame) =>
      CorpusOps.gumbelTopK(d, "doc_id", "lw", k = 20)
        .select("doc_id").as[Long].collect().toSet
    val a = pick(docs)
    assert(a.size == 20)
    assert(a.contains(137L), "a +100-log-weight doc must survive any 20-of-200 draw")
    assert(pick(docs.repartition(13)) == a, "sample must not depend on partitioning")
    // k >= n degenerates to the full set
    assert(pick(docs.limit(5)).size == 5)
  }

  test("semanticDecontaminate: cosine threshold flags near-duplicates of the eval set") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // exact match of t1 -> cos 1.0
      (2L, Seq(0.9, 0.1, 0.0)),   // near t1
      (3L, Seq(0.0, 0.0, 1.0)),   // orthogonal to both
      (4L, Seq(0.0, 0.0, 0.0))    // zero vector -> cos 0, never NaN
    ).toDF("id", "vec")
    val evalSet = Seq(Tuple1(Seq(1.0, 0.0, 0.0)), Tuple1(Seq(0.0, 1.0, 0.0))).toDF("e")
    val got = CorpusOps.semanticDecontaminate(corpus, "id", "vec", evalSet, "e", tau = 0.8)
      .as[(Long, Double, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(math.abs(got(1L)._1 - 1.0) < 1e-12 && !got(1L)._2)
    assert(got(2L)._1 > 0.8 && !got(2L)._2)
    assert(math.abs(got(3L)._1) < 1e-12 && got(3L)._2)
    assert(got(4L)._1 == 0.0 && got(4L)._2, "zero vector must score 0, not NaN")
  }

  test("semanticDecontaminate: driver-literal bound and empty eval set fail fast") {
    val corpus = Seq((1L, Seq(1.0, 0.0))).toDF("id", "vec")
    val big = (0 until 10).map(i => Tuple1(Seq(i.toDouble, 1.0))).toDF("e")
    intercept[IllegalArgumentException] {
      CorpusOps.semanticDecontaminate(corpus, "id", "vec", big, "e", 0.5, maxTestVecs = 5)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.semanticDecontaminate(corpus, "id", "vec", big.limit(0), "e", 0.5)
    }
  }

  test("semanticDecontaminate: no join or shuffle in the corpus pass (literal fold)") {
    val corpus = (0L until 50L).map(i => (i, Seq(i.toDouble, 1.0, 2.0))).toDF("id", "vec")
    val evalSet = Seq(Tuple1(Seq(1.0, 1.0, 2.0))).toDF("e")
    val plan = CorpusOps.semanticDecontaminate(corpus, "id", "vec", evalSet, "e", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"corpus pass must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"corpus pass must not shuffle:\n$plan")
  }

  test("bloomDecontaminate block hygiene: repeated calls pin nothing") {
    val sc = spark.sparkContext
    val corpus = (0L until 100L).map(i => (i, s"k$i")).toDF("id", "key")
    val evalSet = Seq("k1", "k2").toDF("k")
    val before = sc.getPersistentRDDs.keySet
    for (_ <- 0 until 5)
      CorpusOps.bloomDecontaminate(corpus, "key", evalSet, "k").count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bloomDecontaminate left ${leaked.size} pinned RDDs")
  }

  // ------------------------------------------------------- histogram sketch
  test("histogramSketch: clamps to edge bins; state merges by summing counts") {
    val a = Seq(-5L, 0L, 7L, 8L, 100L).map(v => ("g", v)).toDF("grp", "v")
    val b = Seq(3L, 9L, 200L).map(v => ("g", v)).toDF("grp", "v")
    val sk = (df: org.apache.spark.sql.DataFrame) =>
      CorpusOps.histogramSketch(df, Seq("grp"), "v", 0L, 32L, 4)
        .as[(String, Int, Long)].collect().toSeq
    // binW=8: -5,0,7 -> bin 0; 8 -> bin 1; 100 -> clamped to bin 3
    assert(sk(a).sortBy(_._2) == Seq(("g", 0, 3L), ("g", 1, 1L), ("g", 3, 1L)))
    // merge property: sketch(a ∪ b) == sum of counts of sketch(a) + sketch(b)
    val merged = (sk(a) ++ sk(b)).groupBy(r => (r._1, r._2))
      .map { case (k, rs) => (k._1, k._2, rs.map(_._3).sum) }.toSet
    assert(sk(a.unionByName(b)).toSet == merged)
  }

  test("histogramQuantiles: interpolation is exact on a uniform fill") {
    // 32 values 0..31 over [0,32) with 4 bins: each bin holds 8, and the
    // interpolated quantile of a uniform histogram is just q*n scaled: for
    // q=0.5, target=16, bin 2 (cum 24, cumBefore 16 is NOT < 16 -> bin 1 has
    // cum 16 >= 16 and cumBefore 8 < 16): est = 8 + 8*(16-8)/8 = 16.
    val df = (0L until 32L).map(v => ("g", v)).toDF("grp", "v")
    val st = CorpusOps.histogramSketch(df, Seq("grp"), "v", 0L, 32L, 4)
    val got = CorpusOps.histogramQuantiles(st, Seq("grp"), 0L, 32L, 4,
        Seq(0.25, 0.5, 0.75))
      .as[(String, Double, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map(0.25 -> 8.0, 0.5 -> 16.0, 0.75 -> 24.0))
    // exactly one bin answers each (group, q): boundary targets never double-fire
    val n = CorpusOps.histogramQuantiles(st, Seq("grp"), 0L, 32L, 4,
      Seq(0.25, 0.5, 0.75, 0.99)).count()
    assert(n == 4L)
  }

  test("unigramDrift: identical = 0, disjoint = ln 2, hand-computed middle case") {
    def toks(ts: String*) = ts.map(Tuple1(_)).toDF("term")
    def js(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      CorpusOps.unigramDrift(a, b).select("js").as[Double].collect()(0)
    assert(js(toks("x", "y", "z"), toks("z", "x", "y")) == 0.0)
    assert(math.abs(js(toks("a", "a"), toks("b")) - math.log(2)) < 1e-12)
    // A = [x,x,y], B = [x,y,y]: by symmetry js = 2/3·ln(4/3) + 1/3·ln(2/3)
    val expected = 2.0 / 3 * math.log(4.0 / 3) + 1.0 / 3 * math.log(2.0 / 3)
    assert(math.abs(js(toks("x", "x", "y"), toks("x", "y", "y")) - expected) < 1e-12)
    // totals and union vocab are reported
    val row = CorpusOps.unigramDrift(toks("x", "x"), toks("y"))
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(row._1 == 2L && row._2 == 1L && row._3 == 2L)
  }

  test("skewReport: hand-computed Gini, uniform = exactly 0, heavy key leads") {
    // a×4, b×1, c×1: asc ranks b=1 c=2 a=3 -> A = 1+3+20 = 24, nT = 18,
    // G = (24-18)/18 = 1/3
    val rows = (Seq.fill(4)("a") ++ Seq("b", "c")).map(Tuple1(_)).toDF("k")
    val got = CorpusOps.skewReport(rows, "k", topK = 2)
      .as[(Int, String, Long, Double, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 2)
    assert(got(0)._2 == "a" && got(0)._3 == 4L && got(0)._4 == 4.0 / 6)
    assert(got(0)._5 == 3L && got(0)._6 == 6L)
    assert(got(0)._7 == 6.0 / 18)
    // count tie between b and c -> smaller key ranks 2
    assert(got(1)._2 == "b" && got(1)._3 == 1L)
    // perfectly uniform keys: Gini exactly 0 (integer numerator cancels)
    val uni = (1 to 30).map(i => Tuple1(s"k${i % 10}")).toDF("k")
    val g0 = CorpusOps.skewReport(uni, "k", topK = 1)
      .select("gini").as[Double].collect()(0)
    assert(g0 == 0.0)
    // stable under repartition (the two-phase rank is partition-invariant)
    val again = CorpusOps.skewReport(rows.repartition(7), "k", topK = 2)
      .as[(Int, String, Long, Double, Long, Long, Double)].collect().toSet
    assert(again == got.toSet)
  }
}
