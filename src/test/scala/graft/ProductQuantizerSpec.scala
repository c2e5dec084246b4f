package graft

import graft.operators.{ProductQuantizer => PQ, VectorSearch}
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) =
    (0 until n).map { i =>
      (i, (0 until dim).map(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("id", "v")

  test("encode: one code per (vector, subspace), codes within codebook range") {
    val corpus = vecs(40, 16)
    val cb = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8)
    val codes = PQ.encode(corpus, "id", "v", cb).as[(String, Int, Int)].collect()
    assert(codes.length == 40 * 4)
    assert(codes.map(c => (c._1, c._2)).distinct.length == 40 * 4)
    assert(codes.forall(c => c._3 >= 1 && c._3 <= 8))
    // a codebook seed encodes to ITSELF in every subspace (distance 0)
    val cw = cb.codewords.select("sub", "code", "cvec").collect()
    assert(cw.length == 4 * 8)
  }

  test("encode is repartition-stable and deterministic") {
    val corpus = vecs(30, 16)
    val cb = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8)
    val a = PQ.encode(corpus, "id", "v", cb).as[(String, Int, Int)].collect().toSet
    val b = PQ.encode(corpus.repartition(7), "id", "v", cb)
      .as[(String, Int, Int)].collect().toSet
    assert(a == b)
  }

  test("adc approximates exact inner-product ranking on clustered data") {
    // two well-separated clusters: ADC must retrieve the query's own cluster
    val rows = (0 until 30).map { i =>
      val base = if (i < 15) 1f else -1f
      (i, (0 until 16).map(d => base + 0.01f * ((i * 13 + d) % 7)))
    }
    val corpus = rows.toDF("id", "v")
    val cb = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8)
    val codes = PQ.encode(corpus, "id", "v", cb)
    val q = Seq((999, (0 until 16).map(_ => 1f))).toDF("id", "v")
    val got = PQ.adcTopK(cb, codes, q, "id", "v", 10)
      .select("neighbor_id").as[String].collect()
    assert(got.length == 10)
    assert(got.forall(_.toInt < 15), s"ADC pulled from the wrong cluster: ${got.toSeq}")
    // the exact top-1 survives in the ADC top-10 (PQ guarantees coarse
    // ranking; within-cluster resolution is quantized away by design)
    val exact = VectorSearch.knnJoin(q, corpus, "id", "v", "id", "v", 1)
      .select("neighbor_id").as[String].head()
    assert(got.contains(exact))
  }

  test("ivf-pq: full-probe equals plain ADC; low-probe stays within probed cells") {
    val rows = (0 until 40).map { i =>
      val base = if (i < 20) 1f else -1f
      (i, (0 until 16).map(d => base + 0.01f * ((i * 13 + d) % 7)))
    }
    val corpus = rows.toDF("id", "v")
    val ivf = graft.operators.IvfIndex.build(corpus, "id", "v", nList = 4)
    val cb = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8)
    val codes = PQ.encode(corpus, "id", "v", cb)
    val q = Seq((999, (0 until 16).map(_ => 1f))).toDF("id", "v")
    def rows2set(df: org.apache.spark.sql.DataFrame) =
      df.select("neighbor_id", "rank").as[(String, Int)].collect().toSet
    // probing every cell IS plain ADC
    val full = rows2set(PQ.ivfAdcTopK(ivf, cb, codes, q, "id", "v", nProbe = 4, k = 5))
    val plain = rows2set(PQ.adcTopK(cb, codes, q, "id", "v", 5))
    assert(full == plain)
    // one probe: results restricted to one cell, still the right cluster
    val one = PQ.ivfAdcTopK(ivf, cb, codes, q, "id", "v", nProbe = 1, k = 5)
      .select("neighbor_id").as[String].collect()
    assert(one.nonEmpty && one.forall(_.toInt < 20), one.toSeq.toString)
  }

  test("lloyd refinement lowers quantization error and stays deterministic") {
    val corpus = vecs(60, 16)
    def sqErr(cb: PQ.Codebook): Double = {
      // mean ‖subvector − codeword‖² over the corpus under codebook cb
      val codes = PQ.encode(corpus, "id", "v", cb)
      val sv = corpus.select(col("id").cast("string").as("id"),
          posexplode(transform(sequence(lit(0), lit(3)),
            i => slice(col("v"), i * 4 + 1, lit(4)))))
        .select(col("id"), col("pos").as("sub"), col("col").cast("array<double>").as("sv"))
      codes.join(sv, Seq("id", "sub")).join(cb.codewords, Seq("sub", "code"))
        .select(aggregate(zip_with(col("sv"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("e"))
        .agg(avg("e")).head().getDouble(0)
    }
    val seeded = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8)
    val refined = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8, iters = 1)
    val refined2 = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8, iters = 2)
    val (e0, e1, e2) = (sqErr(seeded), sqErr(refined), sqErr(refined2))
    assert(e1 < e0, s"one Lloyd step must lower mean sq error: $e1 vs $e0")
    assert(e2 <= e1 + 1e-12, s"second step must not increase error: $e2 vs $e1")
    // deterministic: same input partitioned differently → identical codebook
    val again = PQ.train(corpus.repartition(7), "id", "v", m = 4, dsub = 4, k = 8, iters = 1)
    val a = refined.codewords.select("sub", "code", "cvec").as[(Int, Int, Seq[Double])]
      .collect().map { case (s, c, v) => (s, c, v.map(x => math.round(x * 1e9))) }.toSet
    val b = again.codewords.select("sub", "code", "cvec").as[(Int, Int, Seq[Double])]
      .collect().map { case (s, c, v) => (s, c, v.map(x => math.round(x * 1e9))) }.toSet
    assert(a == b)
  }

  test("ivf-pq recall curve: full-probe recall equals the pure-ADC ceiling") {
    // NOTE: unlike plain IVF (exact scoring ⇒ recall monotone in nProbe),
    // ADC recall need NOT be monotone — widening the probe set can admit
    // imposters whose quantized scores overtake true neighbors. What IS
    // guaranteed: at nProbe = nList the search equals plain ADC over the
    // whole corpus, so the curve's last point is exactly the PQ-error
    // ceiling a user trades memory against.
    val corpus = vecs(120, 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rc").toString
    graft.operators.IvfPq.buildAndSave(corpus, "id", "v", dir,
      nList = 8, m = 4, dsub = 4, k = 8, pqIters = 1)
    val queries = corpus.filter(col("id") < 5)
    val curve = graft.operators.IvfPq.recallCurve(spark, dir, corpus, queries,
      "id", "v", "id", "v", k = 5, nProbes = Seq(1, 4, 8))
    assert(curve.map(_._1) == Seq(1, 4, 8))
    val rs = curve.map(_._2)
    assert(rs.forall(r => r >= 0.0 && r <= 1.0), rs.toString)
    assert(rs.last > 0.0)
    // the full-probe point IS plain ADC: recompute its recall independently
    val cb = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8, iters = 1)
    val codes = PQ.encode(corpus, "id", "v", cb)
    val exact = VectorSearch.knnJoin(queries, corpus, "id", "v", "id", "v", 5)
      .select("query_id", "neighbor_id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = PQ.adcTopK(cb, codes, queries, "id", "v", 5)
      .select("query_id", "neighbor_id").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adcRecall = exact.map { case (q, ex) =>
      adc.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(math.abs(rs.last - adcRecall) < 1e-9, s"${rs.last} vs $adcRecall")
  }

  test("refined search: exact re-rank recovers accuracy; full-corpus shortlist IS exact KNN") {
    val corpus = vecs(120, 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_rf").toString
    graft.operators.IvfPq.buildAndSave(corpus, "id", "v", dir,
      nList = 8, m = 4, dsub = 4, k = 8, pqIters = 1)
    val queries = corpus.filter(col("id") < 5)
    // refined recall at least matches the unrefined ADC curve pointwise
    val plain = graft.operators.IvfPq.recallCurve(spark, dir, corpus, queries,
      "id", "v", "id", "v", k = 5, nProbes = Seq(4, 8)).toMap
    val refined = graft.operators.IvfPq.recallCurveRefined(spark, dir, corpus, queries,
      "id", "v", "id", "v", k = 5, nProbes = Seq(4, 8), refine = 4).toMap
    for (p <- Seq(4, 8))
      assert(refined(p) >= plain(p) - 1e-9, s"nProbe=$p: ${refined(p)} < ${plain(p)}")
    // full probe + shortlist covering the whole corpus ⇒ the exact answer
    val viaRefine = graft.operators.IvfPq.searchSavedRefined(spark, dir, queries,
        "id", "v", corpus, "id", "v", nProbe = 8, k = 5, refine = 24)
      .select("query_id", "neighbor_id", "rank").as[(String, String, Int)].collect().toSet
    val viaExact = graft.operators.VectorSearch.knnJoin(
        queries, corpus, "id", "v", "id", "v", 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(String, String, Int)].collect().toSet
    assert(viaRefine == viaExact)
  }

  test("saved ivf-pq index: searchSaved equals the in-memory composition; empty-safe") {
    val rows = (0 until 40).map { i =>
      val base = if (i < 20) 1f else -1f
      (i, (0 until 16).map(d => base + 0.01f * ((i * 13 + d) % 7)))
    }
    val corpus = rows.toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    graft.operators.IvfPq.buildAndSave(corpus, "id", "v", dir,
      nList = 4, m = 4, dsub = 4, k = 8)
    // the code table at rest is cell-partitioned (directory pruning works)
    assert(new java.io.File(s"$dir/codes.parquet").listFiles()
      .exists(_.getName.startsWith("_cell=")))
    val q = Seq((999, (0 until 16).map(_ => 1f))).toDF("id", "v")
    val ivf = graft.operators.IvfIndex.build(corpus, "id", "v", nList = 4)
    val cb = PQ.train(corpus, "id", "v", m = 4, dsub = 4, k = 8)
    val codes = PQ.encode(corpus, "id", "v", cb)
    def rows2set(df: org.apache.spark.sql.DataFrame) =
      df.select("neighbor_id", "rank", "score").as[(String, Int, Double)].collect().toSet
    for (p <- Seq(1, 2, 4)) {
      val saved = rows2set(
        graft.operators.IvfPq.searchSaved(spark, dir, q, "id", "v", p, 5))
      val mem = rows2set(PQ.ivfAdcTopK(ivf, cb, codes, q, "id", "v", p, 5))
      assert(saved == mem, s"nProbe=$p")
    }
    // empty corpus round-trips without a crash and serves empty results
    val edir = java.nio.file.Files.createTempDirectory("ivfpq_e").toString
    graft.operators.IvfPq.buildAndSave(corpus.limit(0), "id", "v", edir,
      nList = 4, m = 4, dsub = 4, k = 8)
    assert(graft.operators.IvfPq.searchSaved(spark, edir, q, "id", "v", 1, 5).isEmpty)
  }

  test("ivf-pq deleteSaved: dead ids never served, emptied cells vanish, pin-free") {
    import graft.operators.IvfPq
    val corpus = vecs(64, 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_del").toString
    IvfPq.buildAndSave(corpus, "id", "v", dir, nList = 4, m = 4, dsub = 4, k = 8)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val dead = (0 until 16).map(_.toString)
    IvfPq.deleteSaved(spark, dir, dead)
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    assert(codes.select("id").distinct().count() == 48)
    assert(codes.filter(col("id").isin(dead: _*)).isEmpty)
    // full-probe searchSaved serves only survivors
    val q = corpus.filter(col("id") === 63).select(col("id").as("qid"), col("v").as("qv"))
    val got = IvfPq.searchSaved(spark, dir, q, "qid", "qv", nProbe = 4, k = 64)
      .select("neighbor_id").as[String].collect().toSet
    assert(got.nonEmpty && got.intersect(dead.toSet).isEmpty, got.toString)
    // unknown ids: no-op; full wipe leaves a readable empty layout
    IvfPq.deleteSaved(spark, dir, Seq("zzz"))
    IvfPq.deleteSaved(spark, dir, (0 until 64).map(_.toString))
    assert(spark.read.parquet(s"$dir/codes.parquet").isEmpty)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"deleteSaved left ${leaked.size} pinned RDDs")
  }

  test("ivf-pq addSaved: delta merges into touched cells, dedups, stays pin-free") {
    import graft.operators.IvfPq
    val corpus = vecs(64, 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_add").toString
    // build over the first 40 ids only
    IvfPq.buildAndSave(corpus.filter(col("id") < 40), "id", "v", dir,
      nList = 4, m = 4, dsub = 4, k = 8)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // delta includes 8 already-present ids (32-39) and 24 new ones (40-63)
    IvfPq.addSaved(spark, dir, corpus.filter(col("id") >= 32), "id", "v")
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    assert(codes.select("id").distinct().count() == 64)
    assert(codes.groupBy("id", "sub").count().filter(col("count") > 1).isEmpty,
      "duplicate (id, sub) code rows after re-adding present ids")
    // re-adding the same delta is a no-op
    IvfPq.addSaved(spark, dir, corpus.filter(col("id") >= 32), "id", "v")
    assert(spark.read.parquet(s"$dir/codes.parquet")
      .select("id").distinct().count() == 64)
    // added ids are served by searchSaved at full probe
    val q = corpus.filter(col("id") === 63).select(col("id").as("qid"), col("v").as("qv"))
    val got = IvfPq.searchSaved(spark, dir, q, "qid", "qv", nProbe = 4, k = 64)
      .select("neighbor_id").as[String].collect().toSet
    assert(got.contains("63"), s"added id not served: $got")
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"addSaved left ${leaked.size} pinned RDDs")
    // empty saved index refuses the add with a rebuild pointer
    val edir2 = java.nio.file.Files.createTempDirectory("ivfpq_add_e").toString
    IvfPq.buildAndSave(corpus.limit(0), "id", "v", edir2, nList = 4, m = 4, dsub = 4, k = 8)
    val e = intercept[IllegalArgumentException] {
      IvfPq.addSaved(spark, edir2, corpus.limit(4), "id", "v")
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }
}
