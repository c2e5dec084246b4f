package graft

import graft.operators.{Dedup, VectorSearch}
import org.apache.spark.sql.functions._

/** Unit semantics for the round-12 additions: blocked contrastive-mining
  * variants (sim4b/sim6b/sim8b) and the empty-input safety of every
  * sign-block sketch call site. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters far apart: within-cluster cosines ≈ 1, cross ≈ 0.
  // With ANY sign sketch, near-identical vectors land in the same block, so
  // within-cluster edges must survive blocking.
  private lazy val clustered = Seq(
    ("a1", "A", Array(1.0f, 0.01f, 0.0f, 0.0f)),
    ("a2", "A", Array(1.0f, 0.02f, 0.0f, 0.0f)),
    ("a3", "B", Array(1.0f, 0.03f, 0.0f, 0.0f)),
    ("b1", "B", Array(0.0f, 0.0f, 1.0f, 0.01f)),
    ("b2", "B", Array(0.0f, 0.0f, 1.0f, 0.02f)),
    ("b3", "A", Array(0.0f, 0.0f, 1.0f, 0.03f))).toDF("id", "lab", "v")

  test("blocked labelAgreement: result is the exact audit restricted to blocks") {
    val exact = VectorSearch.labelAgreement(clustered, "id", "v", "lab", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val blocked = VectorSearch.labelAgreement(clustered, "id", "v", "lab", k = 5,
      blockBits = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // blocking can only REMOVE candidates: k_eff never grows
    blocked.foreach { case (id, kEff) =>
      assert(kEff <= exact(id), s"$id: blocked k_eff $kEff > exact ${exact(id)}")
    }
    // near-identical vectors share sign patterns: each anchor keeps its two
    // same-cluster neighbors
    assert(blocked.values.forall(_ >= 2), blocked)
  }

  test("blocked mutualKnn: edges are a subset of the exact graph; clusters survive") {
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getString(1))
    val exact = VectorSearch.mutualKnn(clustered, "id", "v", k = 3)
      .collect().map(key).toSet
    val blocked = VectorSearch.mutualKnn(clustered, "id", "v", k = 3, blockBits = 3)
      .collect().map(key).toSet
    assert(blocked.subsetOf(exact), s"blocked edges not ⊆ exact: ${blocked -- exact}")
    // the within-cluster mutual edges survive
    assert(blocked.contains(("a1", "a2")) && blocked.contains(("b1", "b2")), blocked)
  }

  test("blocked knnDensity: dense rows stay high; k_eff bounded by block size") {
    val blocked = VectorSearch.knnDensity(clustered, "id", "v", k = 5, blockBits = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    blocked.foreach { case (id, (kEff, mean)) =>
      assert(kEff >= 2 && kEff <= 5, s"$id k_eff $kEff")
      assert(mean > 0.9, s"$id: within-cluster density $mean should be ≈1")
    }
  }

  test("empty input: blockBits > 0 yields empty results, not a head() crash") {
    val empty = Seq.empty[(String, String, Array[Float])].toDF("id", "lab", "v")
    assert(VectorSearch.hardNegatives(empty, "id", "v", "lab", k = 3,
      minCosine = 0.0, blockBits = 3).count() == 0)
    assert(VectorSearch.mutualKnn(empty, "id", "v", k = 3, blockBits = 3).count() == 0)
    assert(VectorSearch.labelAgreement(empty, "id", "v", "lab", k = 3,
      blockBits = 3).count() == 0)
    assert(VectorSearch.knnDensity(empty, "id", "v", k = 3, blockBits = 3).count() == 0)
    assert(Dedup.embeddingNearDupPairs(empty, "id", "v", minCosine = 0.5,
      blockBits = 3).count() == 0)
  }
}
