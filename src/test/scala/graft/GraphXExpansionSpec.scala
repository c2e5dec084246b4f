package graft

import graft.operators.{GraphXExpansion, SubgraphExpansion}
import org.apache.spark.sql.functions._

/** GraphX/Pregel expansion must produce the same id sets as the semi-join loop. */
class GraphXExpansionSpec extends SparkSpec {
  import spark.implicits._

  private def sets(sub: graft.operators.Subgraph): (Set[String], Set[String]) = (
    sub.entityIds.select("entity_id").as[String].collect().toSet,
    sub.relationIds.select("relation_id").as[String].collect().toSet)

  test("GraphX expansion equals semi-join expansion on the lineitem graph, degrees 0-2") {
    val er = spark.read.parquet(sf("lineitem"))
      .select(col("l_partkey").cast("string").as("entity_id"),
        col("l_orderkey").cast("string").as("relation_id"))
      .distinct().localCheckpoint(true)
    val seeds = er.filter(col("entity_id").cast("long") % 101 === 0)
      .select("entity_id").distinct()
    val noRels = Seq.empty[String].toDF("relation_id")
    for (degree <- 0 to 2) {
      val loop = sets(SubgraphExpansion.expand(seeds, noRels, er, degree))
      val pregel = sets(GraphXExpansion.expand(seeds, noRels, er, degree))
      assert(pregel._1 == loop._1, s"entity sets differ at degree $degree")
      assert(pregel._2 == loop._2, s"relation sets differ at degree $degree")
    }
  }

  test("expandFrames equals the driver loop: id sets, per-degree counts, samples") {
    val er = spark.read.parquet(sf("lineitem"))
      .select(col("l_partkey").cast("string").as("entity_id"),
        col("l_orderkey").cast("string").as("relation_id"))
      .distinct().localCheckpoint(true)
    val seeds = er.filter(col("entity_id").cast("long") % 101 === 0)
      .select("entity_id").distinct()
    val noRels = Seq.empty[String].toDF("relation_id")
    for (degree <- 0 to 2) {
      val loop = SubgraphExpansion.expand(seeds, noRels, er, degree)
      val frames = SubgraphExpansion.expandFrames(seeds, noRels, er, degree,
        historySampleCap = 1 << 20)
      assert(sets(frames) == sets(loop), s"id sets differ at degree $degree")
      assert(frames.history.map(h => (h.degree, h.entityCount, h.relationCount)) ==
        loop.history.map(h => (h.degree, h.entityCount, h.relationCount)))
      // with an uncapped sample the per-step id lists match the loop's exactly
      assert(frames.history.map(_.addedEntityIds) == loop.history.map(_.addedEntityIds))
      assert(frames.history.map(_.addedRelationIds) == loop.history.map(_.addedRelationIds))
    }
    // seed relations participate in the init-merge identically
    val someRels = er.select("relation_id").distinct().limit(3)
    val l2 = sets(SubgraphExpansion.expand(seeds, someRels, er, 1))
    val f2 = sets(SubgraphExpansion.expandFrames(seeds, someRels, er, 1))
    assert(f2 == l2)
    // default cap 0 => empty samples, counts still exact
    val bare = SubgraphExpansion.expandFrames(seeds, noRels, er, 1)
    assert(bare.history.forall(h => h.addedEntityIds.isEmpty && h.addedRelationIds.isEmpty))
    assert(bare.history.map(_.entityCount) ==
      SubgraphExpansion.expand(seeds, noRels, er, 1).history.map(_.entityCount))
  }

  test("per-degree history matches the semi-join loop step-by-step") {
    val er = spark.read.parquet(sf("lineitem"))
      .select(col("l_partkey").cast("string").as("entity_id"),
        col("l_orderkey").cast("string").as("relation_id"))
      .distinct().localCheckpoint(true)
    val seeds = er.filter(col("entity_id").cast("long") % 101 === 0)
      .select("entity_id").distinct()
    val noRels = Seq.empty[String].toDF("relation_id")
    for (degree <- 0 to 2) {
      val loop = SubgraphExpansion.expand(seeds, noRels, er, degree).history
      val pregel = GraphXExpansion.expand(seeds, noRels, er, degree,
        historySampleCap = Int.MaxValue).history
      assert(pregel.size == loop.size, s"step count differs at degree $degree")
      pregel.zip(loop).foreach { case (p, l) =>
        assert(p.degree == l.degree)
        assert(p.entityCount == l.entityCount, s"entity total at step ${l.degree}, degree $degree")
        assert(p.relationCount == l.relationCount, s"relation total at step ${l.degree}, degree $degree")
        assert(p.addedEntityIds == l.addedEntityIds, s"added entities at step ${l.degree}, degree $degree")
        assert(p.addedRelationIds == l.addedRelationIds, s"added relations at step ${l.degree}, degree $degree")
      }
    }
  }

  test("history id lists are capped at historySampleCap but counts stay exact") {
    val er = spark.read.parquet(sf("lineitem"))
      .select(col("l_partkey").cast("string").as("entity_id"),
        col("l_orderkey").cast("string").as("relation_id"))
      .distinct().localCheckpoint(true)
    val seeds = er.filter(col("entity_id").cast("long") % 101 === 0)
      .select("entity_id").distinct()
    val noRels = Seq.empty[String].toDF("relation_id")
    val full = GraphXExpansion.expand(seeds, noRels, er, 1, historySampleCap = Int.MaxValue)
    val capped = GraphXExpansion.expand(seeds, noRels, er, 1, historySampleCap = 5)
    full.history.zip(capped.history).foreach { case (f, c) =>
      assert(c.entityCount == f.entityCount && c.relationCount == f.relationCount)
      assert(c.addedEntityIds.size <= 5 && c.addedRelationIds.size <= 5)
      assert(c.addedEntityIds == f.addedEntityIds.take(c.addedEntityIds.size))
    }
  }

  test("expansion fails fast when the working set exceeds maxWorkingSet") {
    val er = spark.read.parquet(sf("lineitem"))
      .select(col("l_partkey").cast("string").as("entity_id"),
        col("l_orderkey").cast("string").as("relation_id"))
      .distinct().localCheckpoint(true)
    val seeds = er.filter(col("entity_id").cast("long") % 101 === 0)
      .select("entity_id").distinct()
    val noRels = Seq.empty[String].toDF("relation_id")
    val e = intercept[IllegalStateException] {
      SubgraphExpansion.expand(seeds, noRels, er, degree = 2, maxWorkingSet = 10)
    }
    assert(e.getMessage.contains("GraphXExpansion"))
    // a generous cap changes nothing
    val normal = sets(SubgraphExpansion.expand(seeds, noRels, er, 2))
    val capped = sets(SubgraphExpansion.expand(seeds, noRels, er, 2, maxWorkingSet = 1 << 20))
    assert(normal == capped)
  }

  test("fused seed+init and fused hops return identical sets and history") {
    val er = spark.read.parquet(sf("lineitem"))
      .select(col("l_partkey").cast("string").as("entity_id"),
        col("l_orderkey").cast("string").as("relation_id"))
      .distinct().localCheckpoint(true)
    val seeds = er.filter(col("entity_id").cast("long") % 101 === 0)
      .select("entity_id").distinct()
    val seedRels = er.filter(col("relation_id").cast("long") % 1009 === 0)
      .select("relation_id").distinct()
    for (degree <- 0 to 2) {
      val plain = SubgraphExpansion.expand(seeds, seedRels, er, degree)
      val fused = SubgraphExpansion.expand(seeds, seedRels, er, degree,
        fuseSeedInit = true)
      assert(sets(fused) == sets(plain), s"sets differ at degree $degree")
      assert(fused.history == plain.history, s"history differs at degree $degree")
    }
  }

  test("seed relations participate in the init-merge identically") {
    val er = Seq(
      ("e1", "r1"), ("e2", "r1"), ("e2", "r2"), ("e3", "r2"),
      ("e4", "r3"), ("e5", "r3"), ("e5", "r4"), ("e6", "r4"))
      .toDF("entity_id", "relation_id")
    val seeds = Seq("e1").toDF("entity_id")
    val seedRels = Seq("r3").toDF("relation_id")
    val loop = sets(SubgraphExpansion.expand(seeds, seedRels, er, 1))
    val pregel = sets(GraphXExpansion.expand(seeds, seedRels, er, 1))
    assert(pregel == loop)
    // sanity: degree-1 from e1 + seed r3 reaches both components' first rings
    assert(loop._1 == Set("e1", "e2", "e4", "e5"))
    assert(loop._2 == Set("r1", "r2", "r3", "r4"))
  }
}
