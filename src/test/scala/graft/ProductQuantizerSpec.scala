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
}
