package graft

import graft.model.{Doc, Triplet}
import graft.rag.{GraphRag, LlmCache, RagConfig, Retry}
import graft.sources.GraphStore
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

class CrudSpec extends SparkSpec {

  test("G8 createPassage grafts incrementally: new rows + set-merged adjacency") {
    val store = new GraphStore(spark, Files.createTempDirectory("crudstore").toString)
    val rag = new GraphRag(spark, store, "crud", config = RagConfig())
    rag.addDocumentsWithTriplets(Seq(
      Doc("p1", "Einstein developed relativity.",
        Seq(Triplet("Einstein", "developed", "relativity")))))
    // graft a second passage that re-mentions an existing entity
    rag.createPassage(Doc("p2", "Einstein won the Nobel prize.",
      Seq(Triplet("Einstein", "won", "Nobel prize"))))

    val stats = store.stats("crud")
    assert(stats("passages") == 2)
    assert(stats("relations") == 2)
    // einstein, relativity, nobel prize
    assert(stats("entities") == 3)
    val einstein = store.table("crud", "entities").filter(col("name") === "einstein")
    val pids = einstein.select("passage_ids").head().getSeq[String](0)
    assert(pids.toSet == Set("p1", "p2"))
    val rids = einstein.select("relation_ids").head().getSeq[String](0)
    assert(rids.length == 2)
    // idempotent set-merge: grafting the same passage again changes nothing
    rag.createPassage(Doc("p2", "Einstein won the Nobel prize.",
      Seq(Triplet("Einstein", "won", "Nobel prize"))))
    val pids2 = store.table("crud", "entities").filter(col("name") === "einstein")
      .select("passage_ids").head().getSeq[String](0)
    assert(pids2.toSet == Set("p1", "p2"))
    assert(store.stats("crud")("passages") == 2)
  }

  test("X3 LLM cache memoizes by md5(prompt+params); spill round-trips") {
    val dir = Files.createTempDirectory("llmcache")
    val calls = new AtomicInteger(0)
    val c = new LlmCache(Some(dir))
    val r1 = c.getOrElseUpdate("prompt A", "t=0") { calls.incrementAndGet(); "answer A" }
    val r2 = c.getOrElseUpdate("prompt A", "t=0") { calls.incrementAndGet(); "answer A'" }
    assert(r1 == "answer A" && r2 == "answer A")
    assert(calls.get() == 1)
    // different params => different key
    c.getOrElseUpdate("prompt A", "t=1") { calls.incrementAndGet(); "answer B" }
    assert(calls.get() == 2)
    // fresh cache reloads from spill
    val c2 = new LlmCache(Some(dir))
    c2.loadSpill()
    val r3 = c2.getOrElseUpdate("prompt A", "t=0") { calls.incrementAndGet(); "MISS" }
    assert(r3 == "answer A")
    assert(calls.get() == 2)
  }

  test("X4 retry with backoff retries then succeeds / exhausts") {
    val n = new AtomicInteger(0)
    val got = Retry.withBackoff(attempts = 3, baseMillis = 1, capMillis = 2) {
      if (n.incrementAndGet() < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(got == "ok" && n.get() == 3)
    intercept[RuntimeException] {
      Retry.withBackoff(attempts = 2, baseMillis = 1, capMillis = 2) {
        throw new RuntimeException("always")
      }
    }
  }

  test("S9 graph catalog: list and drop") {
    val base = Files.createTempDirectory("catstore").toString
    val store = new GraphStore(spark, base)
    val rag = new GraphRag(spark, store, "g1")
    rag.addDocumentsWithTriplets(Seq(Doc("p", "a b c", Seq(Triplet("a", "b", "c")))))
    val rag2 = new GraphRag(spark, store, "g2")
    rag2.addDocumentsWithTriplets(Seq(Doc("p", "x y z", Seq(Triplet("x", "y", "z")))))
    assert(store.listGraphs() == Seq("g1", "g2"))
    store.dropGraph("g1")
    assert(store.listGraphs() == Seq("g2"))
  }
}
