package graft

import graft.functions.HashEmbedder
import graft.model.{Doc, Triplet}
import graft.operators.GraphBuilder
import org.apache.spark.sql.functions._

class GraphBuilderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    Doc("p1", "Einstein developed relativity.",
      Seq(Triplet("Einstein", "developed", "relativity"))),
    Doc("p2", "EINSTEIN won the Nobel prize.",
      Seq(Triplet("EINSTEIN", "won", "Nobel prize"),
        Triplet("Einstein", "developed", "Relativity"))), // dup modulo case
    Doc("p3", "Empty triplet fields are dropped.",
      Seq(Triplet("", "x", "y"), Triplet("valid", "links", "thing"))))

  private lazy val tables = GraphBuilder.build(
    spark.createDataset(docs).toDF(), HashEmbedder(dim = 16))

  test("G2: case-variants collapse to one entity (tests/test_graph.py:133-145)") {
    val names = tables.entities.select("name").as[String].collect().toSet
    assert(names.contains("einstein"))
    assert(tables.entities.filter($"name" === "einstein").count() == 1)
  }

  test("G3: identical triplets dedup to one relation (tests/test_graph.py:204-209)") {
    val rels = tables.relations.filter($"text" === "einstein developed relativity")
    assert(rels.count() == 1)
    // ...but it references both source passages (G6)
    val pids = rels.select("passage_ids").as[Seq[String]].head()
    assert(pids == Seq("p1", "p2"))
  }

  test("G4: relation entity_ids are positional [subject, object] (knowledge_graph.py:76-84)") {
    val r = tables.relations.filter($"text" === "einstein developed relativity")
      .select("entity_ids").as[Seq[String]].head()
    val subjId = tables.entities.filter($"name" === "einstein").select("id").as[String].head()
    val objId = tables.entities.filter($"name" === "relativity").select("id").as[String].head()
    assert(r == Seq(subjId, objId))
  }

  test("G1: malformed/empty-field triplets are dropped (graph/builder.py:150-157)") {
    assert(tables.relations.filter($"subject" === "").count() == 0)
    assert(tables.relations.filter($"text".contains("x y")).count() == 0)
  }

  test("G5: entity adjacency covers both its passages") {
    val e = tables.entities.filter($"name" === "einstein")
      .select("passage_ids").as[Seq[String]].head()
    assert(e == Seq("p1", "p2"))
  }

  test("ids are deterministic across rebuilds") {
    val again = GraphBuilder.build(
      spark.createDataset(docs).toDF(), HashEmbedder(dim = 16))
    val a = tables.entities.select("id").as[String].collect().sorted.toSeq
    val b = again.entities.select("id").as[String].collect().sorted.toSeq
    assert(a == b)
  }

  test("ambiguous decompositions of one relation text both keep adjacency rows") {
    // "a b"+"c"+"d" and "a"+"b c"+"d" join to the SAME text "a b c d": one
    // text-keyed relation (reference identity, graph/builder.py:105-112), but
    // the adjacency must keep BOTH decompositions' entity links — struct-keyed
    // decomp_pairs can't be fooled by a space moving across a field boundary.
    val ambig = Seq(
      Doc("pa", "a b c d", Seq(Triplet("a b", "c", "d"))),
      Doc("pb", "a b c d twice", Seq(Triplet("a", "b c", "d"))))
    val tt = GraphBuilder.build(spark.createDataset(ambig).toDF(), HashEmbedder(dim = 16))
    assert(tt.relations.count() == 1) // identity by normalized text: collapsed
    assert(tt.relations.select(size($"decomp_pairs")).as[Int].head() == 2)
    val idOf = tt.entities.select("name", "id").as[(String, String)].collect().toMap
    val adj = tt.entityRelation.select("entity_id", "role").as[(String, String)]
      .collect().toSet
    assert(adj == Set( // both subjects survive; shared object dedups to one row
      (idOf("a b"), "subject"), (idOf("a"), "subject"), (idOf("d"), "object")))
  }

  test("embeddings are unit vectors (dedup-before-embed, E1+E3)") {
    import graft.functions.VectorFunctions
    val err = tables.entities
      .select(abs(VectorFunctions.l2Norm($"embedding") - 1.0).as("e"))
      .agg(max($"e")).as[Double].head()
    assert(err < 1e-12)
  }
}
