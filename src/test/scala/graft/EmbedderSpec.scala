package graft

import graft.functions.{HashEmbedder, VectorFunctions}
import org.apache.spark.sql.functions._

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("embedInto (relational) is bit-identical to embed (scalar expression)") {
    val docs = Seq(
      ("a", "the quick brown fox"), ("b", "spark native graph engine spark"),
      ("c", ""), ("d", "unicode 爱因斯坦 stripped"), ("e", "single")).toDF("id", "text")
    val e = HashEmbedder(dim = 16)
    val scalar = docs.select(col("id"), e.embed(col("text")).as("v"))
      .as[(String, Seq[Double])].collect().toMap
    val batch = e.embedInto(docs, "text", "v").select("id", "v")
      .as[(String, Seq[Double])].collect().toMap
    assert(scalar.keySet == batch.keySet)
    scalar.foreach { case (k, v) => assert(batch(k) == v, s"row $k") }
    // empty text => zero vector
    assert(scalar("c").forall(_ == 0.0))
  }

  test("embedOne (driver-side) is bit-identical to the Column path") {
    val e = HashEmbedder(dim = 16)
    val texts = Seq("the quick brown fox", "spark native graph engine spark",
      "", "unicode 爱因斯坦 stripped", "single", "Who discovered radium?")
    val sql = texts.toDF("text").select(e.embed(col("text")).as("v"))
      .as[Seq[Double]].collect()
    texts.zip(sql).foreach { case (t, expected) =>
      assert(e.embedOne(t).contains(expected), s"mismatch for <$t>")
    }
  }

  test("int8 quantization round-trips within scale/2 per component") {
    import graft.functions.Quantize
    val emb = spark.read.parquet(sf("embeddings")).limit(200)
    val rows = emb
      .select(col("vec_id"), col("embedding"), Quantize.scaleOf(col("embedding")).as("scale"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("scale"),
        Quantize.dequantize(
          Quantize.quantize(col("embedding"), col("scale")), col("scale")).as("dq"))
      .as[(Long, Seq[Double], Double, Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, scale, dq) =>
      assert(v.length == dq.length)
      v.zip(dq).foreach { case (x, xq) =>
        assert(math.abs(x - xq) <= scale / 2 + 1e-12, s"vec $id: $x vs $xq (scale $scale)")
      }
      // codes stay in int8 range
      if (scale > 0) dq.foreach(xq => assert(math.abs(xq / scale) <= 127.0 + 1e-9))
    }
  }

  test("quantization properties hold on random vectors (codes bounded, error <= scale/2)") {
    import graft.functions.Quantize
    import org.scalacheck.Gen
    val genVec = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    val vecs = (0 until 40).flatMap(i => genVec.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong))).map(_.toSeq) :+ Seq.fill(16)(0.0)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rows = df
      .select(col("id"), col("v"), Quantize.scaleOf(col("v")).as("scale"))
      .select(col("id"), col("v"), col("scale"),
        Quantize.quantize(col("v"), col("scale")).as("q"))
      .as[(Long, Seq[Double], Double, Seq[Int])].collect()
    assert(rows.length == vecs.length)
    rows.foreach { case (id, v, scale, q) =>
      assert(scale >= 0.0)
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range")
      if (scale == 0.0) assert(q.forall(_ == 0))
      else v.zip(q).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-9, s"vec $id: $x vs ${c * scale}")
      }
    }
  }

  test("quantized KNN ranks overlap heavily with exact KNN") {
    import graft.functions.Quantize
    import graft.operators.VectorSearch
    val emb = spark.read.parquet(sf("embeddings"))
    val pre = emb
      .select(col("vec_id"), col("embedding"), Quantize.scaleOf(col("embedding")).as("scale"))
      .select(col("vec_id"), col("scale"),
        Quantize.quantize(col("embedding"), col("scale")).as("q"))
      .select(col("vec_id"), Quantize.dequantize(col("q"), col("scale")).as("dq"))
    val approx = VectorSearch.knnJoin(
      pre.filter(col("vec_id") < 8), pre.filter(col("vec_id") >= 8),
      "vec_id", "dq", "vec_id", "dq", 10)
      .select("query_id", "neighbor_id").as[(String, String)].collect().toSet
    val exact = VectorSearch.knnJoin(
      emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8),
      "vec_id", "embedding", "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(String, String)].collect().toSet
    val overlap = (approx intersect exact).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized/exact top-10 overlap $overlap")
  }

  test("BinarySign: packed words match per-bit signs; Hamming = per-dim sign flips") {
    import graft.functions.BinarySign
    val emb = spark.read.parquet(sf("embeddings"))
    val rows = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        BinarySign.packWord(col("embedding"), 0).as("w0"),
        BinarySign.packWord(col("embedding"), 32).as("w1"))
      .as[(Long, Seq[Double], Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, w0, w1) =>
      assert(w0 >= 0L && w1 >= 0L, s"vec $id: sign bit leaked into a word")
      (0 until 32).foreach { j =>
        assert(((w0 >> j) & 1L) == (if (v(j) > 0) 1L else 0L), s"vec $id bit $j")
        assert(((w1 >> j) & 1L) == (if (v(32 + j) > 0) 1L else 0L), s"vec $id bit ${32 + j}")
      }
    }
    // Hamming over the packed words == count of dims whose sign differs.
    val byId = rows.map(r => r._1 -> r).toMap
    val a = byId(rows.head._1); val b = byId(rows.last._1)
    val expected = (0 until 64).count(i => (a._2(i) > 0) != (b._2(i) > 0))
    val got = emb.sparkSession.range(1)
      .select(BinarySign.hamming2(lit(a._3), lit(a._4), lit(b._3), lit(b._4)).as("h"))
      .as[Int].head()
    assert(got == expected, s"hamming $got != $expected")
  }

  test("embeddings are unit-norm and deterministic across calls") {
    val docs = Seq(("x", "alpha beta gamma")).toDF("id", "text")
    val e = HashEmbedder(dim = 32)
    val v1 = e.embedInto(docs, "text", "v").select("v").as[Seq[Double]].head()
    val v2 = e.embedInto(docs, "text", "v").select("v").as[Seq[Double]].head()
    assert(v1 == v2)
    assert(math.abs(math.sqrt(v1.map(x => x * x).sum) - 1.0) < 1e-12)
  }
}
