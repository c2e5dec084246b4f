package graft

import graft.operators.{Dedup, IvfIndex, VectorSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the scale claims in the README (broadcast
  * the small side, map-side bounded top-k, no unpartitioned windows, pushed
  * parquet filters) asserted against the actual planned operators, so a
  * refactor that silently reintroduces a scan-sized sort or a cartesian
  * product fails CI, not a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("KNN plan: broadcast queries + partial top-k aggregate, no window, no cartesian") {
    val plan = planOf(VectorSearch.knnJoin(
      emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8),
      "vec_id", "embedding", "vec_id", "embedding", 5))
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("ObjectHashAggregate"), "map-side partial top-k missing\n" + plan)
    assert(!plan.contains("Window"), "unexpected window in KNN plan\n" + plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("IVF search plan: broadcast probes, no sort-merge join of the corpus") {
    val index = IvfIndex.build(emb, "vec_id", "embedding", nList = 8)
    val plan = planOf(IvfIndex.search(index,
      emb.filter(col("vec_id") >= 8 && col("vec_id") < 16),
      "vec_id", "embedding", nProbe = 3, k = 5))
    assert(!plan.contains("SortMergeJoin"), "corpus-sized SMJ in IVF search\n" + plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("selective parquet scan pushes its filters to the reader") {
    val plan = planOf(spark.read.parquet(sf("lineitem"))
      .filter(col("l_quantity") < 24 && col("l_discount") >= 0.02)
      .select("l_quantity", "l_discount"))
    assert(plan.contains("PushedFilters: [IsNotNull"), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
    // column pruning: only the two projected columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_discount:double>"), plan)
  }

  test("blocked near-dup joins on the sketch key — never a cartesian product") {
    val plan = planOf(Dedup.embeddingNearDupPairs(
      emb.limit(100), "vec_id", "embedding", minCosine = 0.35, blockBits = 4))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("saved BM25 index scoring prunes the scan to the query terms' buckets") {
    import graft.operators.Bm25
    import spark.implicits._
    val docs = Seq(("d1", "alpha beta gamma"), ("d2", "beta delta"),
      ("d3", "epsilon zeta eta theta"), ("d4", "gamma gamma beta")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25_plan").toString
    Bm25.save(Bm25.build(docs, "id", "text"), dir, nBuckets = 16)
    val q = Seq(("q1", "beta")).toDF("qid", "qtext")
    val scored = Bm25.scoreSaved(spark, dir, q, "qid", "qtext", k = 3)
    val plan = planOf(scored)
    // the postings scan carries a _bucket partition filter — on a saved index
    // that is directory-level pruning: only the query terms' buckets are read
    assert(plan.contains("_bucket"), "no bucket pruning in saved-index scan\n" + plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // and the hybrid/REST path takes this scoreSaved branch whenever a lex
    // index exists (GraphStore.scoreLexIndex) — same pruned shape, not an
    // on-the-fly rebuild: a rebuild re-tokenizes the corpus at query time,
    // which shows up as split()/lower() normalization in the plan (the only
    // legitimate Generate here is the bounded top-k posexplode)
    assert(!plan.contains("split("), "query-time corpus re-tokenization\n" + plan)
    assert(scored.collect().map(_.getString(2)).toSet == Set("d1", "d2", "d4"))
  }

  test("BloomJoin probes with the native BloomFilterMightContain, not a UDF") {
    import graft.operators.BloomJoin
    // parquet-backed inputs: on in-memory LocalRelations the optimizer's
    // ConvertToLocalRelation evaluates the probe filter at plan time and the
    // expression this test pins would legitimately vanish from the plan
    val probe = spark.read.parquet(sf("lineitem"))
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val keys = spark.read.parquet(sf("orders"))
      .filter(col("o_custkey") % 10 === 0).select(col("o_orderkey").as("key"))
    val joined = BloomJoin.semiJoin(probe, keys, "k", "key", expectedKeys = 1024L)
    val plan = planOf(joined)
    // the sketch probe must sit INSIDE whole-stage codegen on the probe-side
    // scan — a boxed ScalaUDF there breaks codegen on exactly the 100 TB
    // relation this operator exists to prune (r15 verdict)
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      "native bloom probe missing from plan\n" + plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "boxed UDF in the bloom probe path\n" + plan)
    // and the prefilter is semantics-invisible: output == plain left-semi
    val exact = probe.join(keys.select(col("key").as("k")), Seq("k"), "left_semi")
    assert(joined.count() == exact.count() &&
      joined.join(exact, Seq("k"), "left_anti").isEmpty)
  }

  test("no unpartitioned window anywhere in the assembly paths") {
    import graft.operators.Assembly
    val ranked = {
      import spark.implicits._
      Seq(("r1", 1), ("r2", 2)).toDF("relation_id", "rel_rank")
    }
    val relations = {
      import spark.implicits._
      Seq(("r1", Seq("pA", "pB")), ("r2", Seq("pC"))).toDF("id", "passage_ids")
    }
    val plan = planOf(Assembly.passagesForRelations(ranked, relations, topK = 3))
    // the only window is the first-seen dedup, partitioned by passage_id
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("passage_id")),
      "window without passage_id partitioning:\n" + windows.mkString("\n"))
  }

  test("KLL single-sketch build: one-md5-pass fast path — no join, no corpus shuffle") {
    import graft.operators.QuantileSketch
    val li = spark.read.parquet(sf("lineitem"))
      .select(col("l_orderkey").as("id"), col("l_quantity").as("v"))
    // r19: the single-sketch build is the eager one-md5-pass form — the
    // returned frame is a filter over the checkpointed tz-superset; the old
    // guarded hazard (a constant-key corpus hash-shuffle with AQE off) can
    // no longer appear because no join exists at all
    val plan = planOf(QuantileSketch.build(li, "v", "id", cap = 64))
    assert(!plan.contains("Exchange"),
      "fast-path sketch frame must not shuffle\n" + plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
