package graft

import graft.operators.{Bm25, HybridFusion, VectorSearch}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval + RRF fusion semantics. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    ("d1", "spark shuffles data across the cluster"),
    ("d2", "spark spark spark tuning spark"),
    ("d3", "a quiet unrelated document about gardening"),
    ("d4", "cluster scheduling and shuffles"),
    ("d5", "the rarestword appears here once")
  ).toDF("id", "text")

  test("bm25: a document retrieves itself top-1 for its own text") {
    val idx = Bm25.build(docsDf, "id", "text")
    val queries = docsDf.select(col("id").as("qid"), col("text").as("qtext"))
    val got = Bm25.score(idx, queries, "qid", "qtext", k = 1)
      .select("query_id", "doc_id").as[(String, String)].collect().toMap
    docsDf.select("id").as[String].collect().foreach { id =>
      assert(got(id) == id, s"doc $id did not self-retrieve: got ${got(id)}")
    }
  }

  test("bm25: rare terms outscore common ones (idf) and tf saturates (k1)") {
    val idx = Bm25.build(docsDf, "id", "text")
    val q = Seq(("q", "rarestword spark")).toDF("qid", "qtext")
    val hits = Bm25.score(idx, q, "qid", "qtext", k = 5)
      .select("doc_id", "score").as[(String, Double)].collect().toMap
    // idf at equal tf: d5's single rarestword (df=1) beats d1's single spark (df=2)
    assert(hits("d5") > hits("d1"))
    // tf saturation: d2 has spark×4 but scores < 4× d1's single spark
    assert(hits("d2") < 4 * hits("d1") && hits("d2") > hits("d1"))
  }

  test("bm25: index build counts (postings, df, dl, corpus stats)") {
    val idx = Bm25.build(docsDf, "id", "text")
    assert(idx.nDocs == 5)
    val sparkRows = idx.postings.filter(col("term") === "spark")
      .select("id", "tf", "df").collect()
    assert(sparkRows.map(_.getString(0)).toSet == Set("d1", "d2"))
    assert(sparkRows.forall(_.getDouble(2) == 2.0))
    assert(sparkRows.find(_.getString(0) == "d2").get.getDouble(1) == 4.0)
    val expectAvg = docsDf.select(Norm0.tokLen(col("text"))).as[Int].collect().sum / 5.0
    assert(math.abs(idx.avgdl - expectAvg) < 1e-12)
  }

  test("bm25: saved index scores identically through term-bucket pruning") {
    val idx = Bm25.build(docsDf, "id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25.save(idx, dir)
    val q = Seq(("q1", "spark cluster"), ("q2", "gardening")).toDF("qid", "qtext")
    val direct = Bm25.score(idx, q, "qid", "qtext", k = 4)
      .collect().map(_.toSeq).toSet
    val pruned = Bm25.scoreSaved(spark, dir, q, "qid", "qtext", k = 4)
      .collect().map(_.toSeq).toSet
    assert(pruned == direct && direct.nonEmpty)
  }

  test("saved-index maintenance: addSavedDocs/deleteSavedDocs == a rebuild, exactly") {
    import graft.sources.BucketedTable
    val a = docsDf.filter(col("id").isin("d1", "d2", "d3"))
    val b = docsDf.filter(col("id").isin("d4", "d5"))
    def newDir() = java.nio.file.Files.createTempDirectory("bm25maint").toString
    val (dirInc, dirFull, dirA) = (newDir(), newDir(), newDir())
    Bm25.save(Bm25.build(a, "id", "text"), dirInc)
    Bm25.save(Bm25.build(docsDf, "id", "text"), dirFull)
    Bm25.save(Bm25.build(a, "id", "text"), dirA)
    def postings(d: String) = BucketedTable
      .read(spark, s"$d/postings.parquet").drop("_bucket")
      .collect().map(_.toSeq).toSet
    def marker(d: String) =
      BucketedTable.readMarker(spark, s"$d/_bm25_stats").get

    Bm25.addSavedDocs(spark, dirInc, b, "id", "text")
    assert(postings(dirInc) == postings(dirFull), "grown postings != rebuild")
    assert(marker(dirInc) == marker(dirFull), "grown stats != rebuild")
    val q = Seq(("q", "spark cluster rarestword gardening")).toDF("qid", "qtext")
    val inc = Bm25.scoreSaved(spark, dirInc, q, "qid", "qtext", k = 5)
      .collect().map(_.toSeq).toSet
    val full = Bm25.scoreSaved(spark, dirFull, q, "qid", "qtext", k = 5)
      .collect().map(_.toSeq).toSet
    assert(inc == full && inc.nonEmpty)

    // re-adding present ids is a no-op
    Bm25.addSavedDocs(spark, dirInc, b, "id", "text")
    assert(postings(dirInc) == postings(dirFull) && marker(dirInc) == marker(dirFull))

    // deleting them back out restores the A-only index exactly
    Bm25.deleteSavedDocs(spark, dirInc, b, "id", "text")
    assert(postings(dirInc) == postings(dirA), "shrunk postings != rebuild")
    assert(marker(dirInc) == marker(dirA), "shrunk stats != rebuild")
    // deleting unknown ids is a no-op
    Bm25.deleteSavedDocs(spark, dirInc, b, "id", "text")
    assert(postings(dirInc) == postings(dirA))
  }

  test("rrf: fuses two runs rank-only, doc in both runs wins") {
    val runA = Seq(("q", 1, "x"), ("q", 2, "y")).toDF("query_id", "rank", "doc_id")
    val runB = Seq(("q", 1, "z"), ("q", 2, "x")).toDF("query_id", "rank", "doc_id")
    val fused = HybridFusion.rrf(Seq(runA, runB), k = 3)
      .orderBy("rank").select("doc_id", "score").as[(String, Double)].collect()
    assert(fused.head._1 == "x") // 1/61 + 1/62 beats any single-run 1/61
    assert(math.abs(fused.head._2 - (1.0 / 61 + 1.0 / 62)) < 1e-12)
    // z = 1/61 (runB rank 1) beats y = 1/62 (runA rank 2)
    assert(fused.map(_._1).toSeq == Seq("x", "z", "y"))
  }

  test("rrf: single-doc tie pinned by id; matches dense+sparse end-to-end shape") {
    val emb = spark.read.parquet(sf("embeddings"))
    val docs = spark.read.parquet(sf("documents"))
    // knnJoin's contract is string ids; the BM25 run restores the corpus's
    // native BIGINT keys, and rrf requires dtype agreement — align dense.
    val dense = VectorSearch.knnJoin(
      emb.filter(col("vec_id") < 2), emb.filter(col("vec_id") >= 2),
      "vec_id", "embedding", "vec_id", "embedding", 5)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("neighbor_id").cast("long").as("doc_id"))
    val idx = Bm25.build(docs.filter(col("doc_id") >= 2), "doc_id", "text")
    val sparse = Bm25.score(idx, docs.filter(col("doc_id") < 2), "doc_id", "text", 5)
      .select("query_id", "rank", "doc_id")
    val fused = HybridFusion.rrf(Seq(dense, sparse), k = 3)
    val perQ = fused.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQ.nonEmpty && perQ.forall(_ <= 3))
    // every fused rank sequence is 1..n
    val ranks = fused.orderBy("query_id", "rank")
      .select("query_id", "rank").as[(Long, Int)].collect()
      .groupBy(_._1).values.map(_.map(_._2).toSeq)
    ranks.foreach(r => assert(r == (1 to r.length)))
    // rrf refuses disagreeing run dtypes instead of silently casting
    val err = intercept[IllegalArgumentException] {
      HybridFusion.rrf(Seq(dense, sparse.select(
        col("query_id").cast("string").as("query_id"),
        col("rank"), col("doc_id"))), k = 3)
    }
    assert(err.getMessage.contains("align the runs"))
  }

  test("lexTokens survives its blocks being freed (rebuild, not crash)") {
    // Bench's per-query cleanup unpersists checkpoints created inside a
    // query; a later query's access must transparently rebuild the shared
    // frame from source — reading a freed truncated-lineage checkpoint would
    // throw "checkpoint block not found" instead
    val dir = "/root/testdata/sf0.001"
    val first = SparkEntry.lexTokens(spark, dir)
    val n1 = first.count()
    assert(SparkEntry.lexTokens(spark, dir) eq first, "second access must hit the cache")
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(first)
    val rebuilt = SparkEntry.lexTokens(spark, dir)
    assert(!(rebuilt eq first), "freed blocks must trigger a rebuild")
    assert(rebuilt.count() == n1)
  }

  test("Index.release frees the materialized build blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val docs = Seq(("d1", "alpha beta gamma"), ("d2", "beta beta delta"))
      .toDF("id", "text")
    val idx = Bm25.build(docs, "id", "text", materialize = true)
    idx.postings.count() // materialize through the checkpointed tf/dl
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty,
      "expected the build to pin tf/dl checkpoints")
    idx.release()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "release() must unpersist every block the build pinned")
  }

  // ------------------------------------------------------------ phrase search
  test("phraseMatch: adjacency required, overlaps counted, phrase normalized") {
    import graft.operators.PhraseSearch
    val docs = Seq(
      (1L, "new york city hall"),   // 1 hit of "new york"
      (2L, "york new haven"),       // reversed: no hit
      (3L, "new new york"),         // still 1 hit (york only once)
      (4L, "a a a b")).toDF("doc_id", "text") // overlap: "a a" twice
    val hit = (p: Seq[String]) =>
      PhraseSearch.phraseMatch(docs, "doc_id", "text", p)
        .as[(Long, Long)].collect().toMap
    assert(hit(Seq("new", "york")) == Map(1L -> 1L, 3L -> 1L))
    assert(hit(Seq("a", "a")) == Map(4L -> 2L))
    // raw phrase words go through T2 normalization like the corpus does
    assert(hit(Seq("New,", "YORK!")) == Map(1L -> 1L, 3L -> 1L))
    assert(hit(Seq("absent", "phrase")).isEmpty)
  }

  // -------------------------------------------------------- query likelihood
  test("queryLikelihood: hand-computed Dirichlet score; coverage beats raw tf") {
    import graft.operators.QueryLikelihood
    val docs = Seq(
      ("d1", "x y"),         // both query terms once
      ("d2", "x x x x"),     // one term, high tf
      ("d3", "z z")).toDF("id", "text")
    val idx = Bm25.build(docs, "id", "text")
    val q = Seq(("q0", "x y")).toDF("qid", "qtext")
    val got = QueryLikelihood.score(idx, q, "qid", "qtext", mu = 10.0, k = 5)
      .select(col("doc_id"), col("rank"), col("score"))
      .as[(String, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // corpus: T=8, cf(x)=5, cf(y)=1. d1: dl=2,tf(x)=1,tf(y)=1
    val T = 8.0; val mu = 10.0
    val d1 = math.log(1 + 1 / (mu * 5 / T)) + math.log(1 + 1 / (mu * 1 / T)) +
      2 * math.log(mu / (2 + mu))
    val d2 = math.log(1 + 4 / (mu * 5 / T)) + 2 * math.log(mu / (4 + mu))
    assert(math.abs(got("d1")._2 - d1) < 1e-12, s"got ${got("d1")._2} want $d1")
    assert(math.abs(got("d2")._2 - d2) < 1e-12)
    // d1 covers both terms (rare y is strong evidence) -> outranks tf-heavy d2
    assert(got("d1")._1 == 1 && got("d2")._1 == 2)
    assert(!got.contains("d3"), "docs matching no query term are not scored")
  }

  // --------------------------------------- pseudo-relevance feedback (RM3)
  test("prfScore: expansion terms bridge vocabulary mismatch; originals keep weight 1") {
    val docs = Seq(
      ("d1", "solar panels power the grid"),
      ("d2", "solar panels on the roof"),
      ("d3", "roof repair and roof panels"), // NO query term: reachable only via expansion
      ("d4", "gardening is unrelated")
    ).toDF("id", "text")
    val idx = Bm25.build(docs, "id", "text")
    val q = Seq(("q", "solar")).toDF("qid", "qtext")
    val plain = Bm25.score(idx, q, "qid", "qtext", k = 4)
      .select("doc_id").as[String].collect().toSet
    assert(plain == Set("d1", "d2"), "baseline: only literal matches score")
    val prf = Bm25.prfScore(idx, q, "qid", "qtext", k = 4,
        fbDocs = 2, fbTerms = 8, lambda = 0.5)
      .select("doc_id", "rank").as[(String, Int)].collect().toMap
    // feedback docs d1+d2 contribute panels/roof/... -> d3 now retrievable
    assert(prf.contains("d3"), s"expansion did not reach d3: $prf")
    assert(!prf.contains("d4"), "unrelated doc must stay unreachable")
    // original term keeps weight 1: a true solar doc still outranks the
    // expansion-only hit
    assert(prf("d1") < prf("d3") && prf("d2") < prf("d3"))
  }
}

/** tiny local helper: token count with the engine tokenizer */
private object Norm0 {
  import org.apache.spark.sql.Column
  def tokLen(c: Column): Column = size(graft.functions.Norm.normTokens(c))
}
