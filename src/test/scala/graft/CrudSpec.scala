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

  test("G9 relation cascade delete scrubs adjacency everywhere (graph.py:430-475)") {
    val store = new GraphStore(spark, Files.createTempDirectory("relcasc").toString)
    val rag = new GraphRag(spark, store, "rc")
    rag.addDocumentsWithTriplets(Seq(
      Doc("p1", "Einstein developed relativity and won the prize.",
        Seq(Triplet("Einstein", "developed", "relativity"),
          Triplet("Einstein", "won", "prize")))))
    val victim = store.table("rc", "relations")
      .filter(col("text") === "einstein developed relativity")
      .select("id").head().getString(0)

    store.deleteRelationCascade("rc", victim)

    assert(store.stats("rc")("relations") == 1)
    // the shared entity keeps its row but loses the deleted relation id
    val einsteinRels = store.table("rc", "entities").filter(col("name") === "einstein")
      .select("relation_ids").head().getSeq[String](0)
    assert(!einsteinRels.contains(victim) && einsteinRels.nonEmpty)
    // passages no longer reference it
    val passRels = store.table("rc", "passages").filter(col("id") === "p1")
      .select("relation_ids").head().getSeq[String](0)
    assert(!passRels.contains(victim) && passRels.nonEmpty)
    // edge tables carry no dangling rows
    assert(store.table("rc", "entity_relation")
      .filter(col("relation_id") === victim).count() == 0)
    assert(store.table("rc", "relation_passage")
      .filter(col("relation_id") === victim).count() == 0)
  }

  test("S7 upsert re-embeds exactly when text changes; retrieval finds the new text") {
    val store = new GraphStore(spark, Files.createTempDirectory("reembed").toString)
    val rag = new GraphRag(spark, store, "re", config = RagConfig(finalTopK = 1))
    rag.addDocumentsWithTriplets(Seq(
      Doc("pA", "alpha beta gamma", Seq(Triplet("alpha", "beta", "gamma"))),
      Doc("pB", "delta epsilon zeta", Seq(Triplet("delta", "epsilon", "zeta")))))
    def vec(id: String): Seq[Double] = store.table("re", "passages")
      .filter(col("id") === id).select("embedding").head().getSeq[Double](0)
    val before = vec("pA")

    // no-op update: identical text keeps the exact stored vector
    rag.updatePassage("pA", "alpha beta gamma")
    assert(vec("pA") == before)

    // real update: vector recomputed, unspecified fields preserved
    rag.updatePassage("pA", "quantum mechanics lecture notes")
    val after = vec("pA")
    assert(after != before)
    val row = store.table("re", "passages").filter(col("id") === "pA")
      .select("text", "entity_ids").head()
    assert(row.getString(0) == "quantum mechanics lecture notes")
    assert(row.getSeq[String](1).nonEmpty, "adjacency lost by text-only update")

    // naive retrieval now finds the passage under its NEW text
    val hits = rag.retrieveNaive("quantum mechanics lecture notes")
    assert(hits.nonEmpty && hits.head.id == "pA", s"got $hits")
  }

  test("bucket-pruned CRUD: a single-passage cascade delete rewrites only affected buckets") {
    import graft.sources.BucketedTable
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("bucketed").toString
    val store = new GraphStore(spark, base)
    val rag = new GraphRag(spark, store, "bk")
    // 40 unconnected passages spread entities/relations/passages over buckets
    rag.addDocumentsWithTriplets((0 until 40).map(i =>
      Doc(s"p$i", s"subject$i predicate$i object$i.",
        Seq(Triplet(s"subject$i", s"predicate$i", s"object$i")))))

    def files(): Set[String] =
      Files.walk(java.nio.file.Paths.get(base)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(_.toString).toSet
    val before = files()
    assert(before.count(_.contains("/passages.parquet/")) > 8,
      "precondition: passages spread over many buckets")

    store.deletePassageCascade("bk", "p7")

    val after = files()
    val untouched = before.intersect(after) // Spark writes fresh file names, so
    // surviving paths are exactly the buckets that were never rewritten
    assert(untouched.size > before.size / 2,
      s"expected most bucket files untouched, kept ${untouched.size}/${before.size}")
    // the passages table specifically: only p7's bucket dir changed
    val pBucket = s"_bucket=${BucketedTable.bucketOf("p7", BucketedTable.DefaultBuckets)}/"
    val passagesChanged = before.diff(after)
      .filter(_.contains("/passages.parquet/"))
    assert(passagesChanged.nonEmpty && passagesChanged.forall(_.contains(pBucket)),
      s"passages rewrite not pruned to $pBucket: $passagesChanged")
    // semantics unchanged: row gone, neighbors scrubbed, count right
    assert(store.table("bk", "passages").filter(col("id") === "p7").count() == 0)
    assert(store.stats("bk")("passages") == 39)
    assert(store.table("bk", "entities")
      .filter(array_contains(col("passage_ids"), "p7")).count() == 0)
    assert(store.table("bk", "relations")
      .filter(array_contains(col("passage_ids"), "p7")).count() == 0)

    // upsert of one id is pruned the same way
    val before2 = files()
    store.upsert("bk", "passages",
      spark.createDataFrame(Seq(("p9", "updated text"))).toDF("id", "text"))
    val after2 = files()
    val changed2 = before2.diff(after2).filter(_.contains("/passages.parquet/"))
    val p9Bucket = s"_bucket=${BucketedTable.bucketOf("p9", BucketedTable.DefaultBuckets)}/"
    assert(changed2.nonEmpty && changed2.forall(_.contains(p9Bucket)), changed2)
    assert(before2.diff(after2).forall(_.contains("/passages.parquet/")),
      "upsert must not rewrite other tables")
    assert(store.table("bk", "passages").filter(col("id") === "p9")
      .select("text").head().getString(0) == "updated text")
  }

  test("no-fragmentation invariant: buckets stay single-file through repeated upserts") {
    import graft.sources.BucketedTable
    val dir = Files.createTempDirectory("compact").toString + "/t.parquet"
    val mk = (ids: Seq[Int]) =>
      spark.createDataFrame(ids.map(i => (s"k$i", i))).toDF("id", "v")
    BucketedTable.write(mk(0 until 40), dir, "id", 8)
    // every rewrite replaces its whole partition directory with one sorted
    // file, so incremental writes can NEVER accumulate small files — the
    // property an append-based layout would need a compactor to restore
    (40 until 52).foreach(i =>
      BucketedTable.upsert(spark, dir, mk(Seq(i)), "id", 8))
    val counts = BucketedTable.fileCounts(spark, dir)
    assert(counts.nonEmpty && counts.values.forall(_ == 1), counts.toString)
    val got = BucketedTable.read(spark, dir).drop("_bucket")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == (0 until 52).map(i => (s"k$i", i)).toSet)
  }

  test("bucket count is a persisted layout property: reopened handles adopt it") {
    val base = Files.createTempDirectory("bmarker").toString
    val writer = new GraphStore(spark, base, nBuckets = 4)
    new GraphRag(spark, writer, "bm").addDocumentsWithTriplets((0 until 12).map(i =>
      Doc(s"p$i", s"s$i v$i o$i.", Seq(Triplet(s"s$i", s"v$i", s"o$i")))))

    // a DIFFERENT handle with the default bucket count must keep working
    // against the 4-bucket layout (marker file wins over the constructor)
    val reader = new GraphStore(spark, base) // default 16
    assert(reader.stats("bm")("passages") == 12)
    reader.deletePassageCascade("bm", "p3")
    assert(reader.stats("bm")("passages") == 11)
    assert(reader.table("bm", "passages").filter(col("id") === "p3").count() == 0)
    reader.upsert("bm", "passages",
      spark.createDataFrame(Seq(("p5", "updated"))).toDF("id", "text"))
    assert(reader.table("bm", "passages").filter(col("id") === "p5")
      .select("text").head().getString(0) == "updated")
    // and the layout stayed 4-bucket: no _bucket dir beyond 0..3 was created
    import scala.jdk.CollectionConverters._
    val dirs = Files.walk(java.nio.file.Paths.get(s"$base/bm/passages.parquet"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_bucket=")).toSet
    assert(dirs.nonEmpty && dirs.forall(d => d.drop(8).toInt < 4), dirs)
  }

  test("store cache registry: one live entry per table, unpersisted on write") {
    import org.apache.spark.storage.StorageLevel
    val store = new GraphStore(spark, Files.createTempDirectory("cachereg").toString)
    val rag = new GraphRag(spark, store, "cl")
    rag.addDocumentsWithTriplets(Seq(
      Doc("p1", "alpha beta gamma", Seq(Triplet("alpha", "beta", "gamma")))))

    val c1 = store.cachedTable("cl", "passages")
    c1.count() // materialize the cache
    assert(c1.storageLevel != StorageLevel.NONE)
    assert(store.cachedTable("cl", "passages") eq c1, "repeat reads share one entry")
    assert(store.cachedTableCount == 1)

    // any write to the table unpersists and evicts its entry
    rag.updatePassage("p1", "delta epsilon")
    assert(c1.storageLevel == StorageLevel.NONE, "stale cache not unpersisted")
    assert(store.cachedTableCount == 0)
    // the next read caches the FRESH contents
    val c2 = store.cachedTable("cl", "passages")
    assert(c2.filter(col("text") === "delta epsilon").count() == 1)
    assert(store.cachedTableCount == 1)

    // retrieval goes through the registry: repeated queries add no entries
    rag.retrieveNaive("delta epsilon")
    rag.retrieveNaive("delta epsilon")
    assert(store.cachedTableCount <= 6, s"got ${store.cachedTableCount}")

    store.dropGraph("cl")
    assert(store.cachedTableCount == 0, "dropGraph must clear the registry")
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
