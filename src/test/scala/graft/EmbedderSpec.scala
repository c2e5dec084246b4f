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

  test("embeddings are unit-norm and deterministic across calls") {
    val docs = Seq(("x", "alpha beta gamma")).toDF("id", "text")
    val e = HashEmbedder(dim = 32)
    val v1 = e.embedInto(docs, "text", "v").select("v").as[Seq[Double]].head()
    val v2 = e.embedInto(docs, "text", "v").select("v").as[Seq[Double]].head()
    assert(v1 == v2)
    assert(math.abs(math.sqrt(v1.map(x => x * x).sum) - 1.0) < 1e-12)
  }
}
