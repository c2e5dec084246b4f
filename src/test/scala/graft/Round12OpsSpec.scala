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

  test("modularity: exact-BIGINT bound is enforced, not just documented") {
    import graft.operators.LabelPropagation
    val labels = Seq(("a", 1L), ("b", 1L)).toDF("id", "label")
    // symmetric pair with 2e9 weight each way: E = 4e9 > the 3e9 bound,
    // where E² would silently wrap a BIGINT
    val heavy = Seq(("a", "b", 2000000000L), ("b", "a", 2000000000L))
      .toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      LabelPropagation.modularityWeighted(labels, heavy, "w").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("exact-BIGINT bound")), ex.toString)

    // at the bound (not past it): still computes, exactly
    val ok = Seq(("a", "b", 1500000000L), ("b", "a", 1500000000L))
      .toDF("src", "dst", "w")
    val row = LabelPropagation.modularityWeighted(labels, ok, "w")
      .select("contrib_num", "contrib_den").head()
    // one community holding everything: Ein = E, deg = E -> num = E·E − E² = 0
    assert(row.getLong(0) == 0L && row.getLong(1) == 9000000000000000000L)
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
