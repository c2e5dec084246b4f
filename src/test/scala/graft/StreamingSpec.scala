package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts over a parquet stream match the batch aggregation") {
    val dir = Files.createTempDirectory("stream_in").toString + "/data"
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 10:55:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-01 11:05:00")
    val batch = Seq(
      (ts0, "click", 1.0), (ts1, "click", 2.0), (ts2, "click", 4.0),
      (ts0, "view", 8.0)).toDF("ts", "event_type", "value")
    batch.write.parquet(dir)
    val schema = batch.schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.windowedCounts(stream, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("win_out")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 11:00:00", "click", 1L, 4.0),
      ("2024-01-01 10:00:00", "view", 1L, 8.0)))
  }

  test("streaming dedup drops duplicate content keys within the watermark") {
    val dir = Files.createTempDirectory("stream_dd").toString + "/data"
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val batch = Seq(
      (ts(0), "fpA", "doc1"), (ts(1), "fpA", "doc1-dup"),
      (ts(2), "fpB", "doc2"), (ts(3), "fpB", "doc2-dup"), (ts(4), "fpC", "doc3")
    ).toDF("ts", "fp", "id")
    batch.write.parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamingOps.dedupStream(stream, Seq("fp"), "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dd_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dd_out").select("fp").as[String].collect().toSeq.sorted
    assert(got == Seq("fpA", "fpB", "fpC"), s"got $got")
  }

  test("streaming heavy hitters: count floor per window, append mode") {
    val dir = Files.createTempDirectory("stream_hh").toString + "/data"
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    val batch = Seq(
      (ts, "spark table scan"), (ts, "spark table join"),
      (ts, "spark table scan"), (ts, "other words here")).toDF("ts", "text")
    batch.write.parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamingOps.streamingHeavyHitters(stream, "ts", "text",
        n = 2, minCount = 2)
      .writeStream.outputMode("complete").format("memory").queryName("hh_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hh_out").select("gram", "cnt")
      .as[(String, Long)].collect().toSet
    // "spark table" ×3; "table scan" ×2; everything else below the floor
    assert(got == Set(("spark table", 3L), ("table scan", 2L)), got.toString)
  }

  test("stateful gap sessionization emits closed sessions") {
    import StreamingOps.Ev
    val dir = Files.createTempDirectory("stream_sess").toString + "/data"
    Seq(Ev(7L, 1000L, 1.0), Ev(7L, 2000L, 2.0), Ev(7L, 100000L, 3.0))
      .toDF().write.parquet(dir)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", LongType),
        StructField("value", DoubleType))))
      .parquet(dir).as[Ev]
    val q = StreamingOps.sessionizeStream(stream, gapNanos = 10000L)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    // first session (2 events) closed by the 98000ns gap; the open one stays in state
    val got = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set((7L, 1000L, 2000L, 2L, 3.0)))
  }

  test("streaming funnel advances equal the batch funnel; constant per-user state") {
    import StreamingOps.FunnelEv
    import graft.operators.EventAnalytics
    val evs = Seq(
      FunnelEv(1L, 10L, "view"), FunnelEv(1L, 20L, "click"), FunnelEv(1L, 30L, "purchase"),
      FunnelEv(2L, 10L, "view"), FunnelEv(2L, 10L, "click"), // same-ts: no chain
      FunnelEv(3L, 20L, "click"), FunnelEv(3L, 30L, "view"),
      FunnelEv(4L, 5L, "view"), FunnelEv(4L, 50L, "click"))
    val dir = Files.createTempDirectory("stream_funnel").toString + "/data"
    evs.toDF().write.parquet(dir)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", LongType),
        StructField("event_type", StringType))))
      .parquet(dir).as[FunnelEv]
    val q = StreamingOps.funnelStream(stream, Seq("view", "click", "purchase"))
      .writeStream.outputMode("append").format("memory").queryName("fun_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("fun_out").groupBy("step")
      .agg(countDistinct("user_id").as("n_users"))
      .as[(Int, Long)].collect().toMap
    val batch = EventAnalytics.funnel(evs.toDF(), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("step", "n_users").as[(Int, Long)].collect()
      .filter(_._2 > 0).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming retention hits equal the batch grid; bitmask dedups repeat days") {
    import StreamingOps.ActiveEv
    import graft.operators.EventAnalytics
    val D = 86400000000000L
    val evs = Seq(
      ActiveEv(1L, 0L), ActiveEv(1L, 10L), ActiveEv(1L, D + 1L),
      ActiveEv(2L, D), ActiveEv(2L, 3 * D),
      ActiveEv(3L, 0L), ActiveEv(3L, 9 * D)) // d9 outside maxOffset=7
    val dir = Files.createTempDirectory("stream_ret").toString + "/data"
    evs.toDF().write.parquet(dir)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", LongType))))
      .parquet(dir).as[ActiveEv]
    val q = StreamingOps.retentionStream(stream, maxOffset = 7)
      .writeStream.outputMode("append").format("memory").queryName("ret_out").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ret_out").groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = EventAnalytics.retention(evs.toDF(), "user_id", "ts", maxOffset = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming lexical maintenance: streamed index == one-shot build, exactly") {
    import graft.operators.Bm25
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "cluster scheduling and shuffles"),
      (3L, "a quiet unrelated document")).toDF("id", "text")
    val dir = Files.createTempDirectory("streamlex").toString
    // seed the index with doc 1, stream docs 2+3 in
    Bm25.save(Bm25.build(docs.filter(col("id") === 1), "id", "text"),
      s"$dir/idx")
    val src = s"$dir/feed"
    docs.filter(col("id") > 1).write.parquet(src)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("text", StringType))))
      .parquet(src)
    val q = StreamingOps.foreachBatchLexMaintain(stream, s"$dir/idx")
    q.awaitTermination()
    val streamed = graft.sources.BucketedTable
      .read(spark, s"$dir/idx/postings.parquet").drop("_bucket")
      .collect().map(_.toSeq).toSet
    val oneShot = Bm25.build(docs, "id", "text")
    val expect = oneShot.postings.collect().map(_.toSeq).toSet
    assert(streamed == expect, "streamed lexical index != one-shot build")
    val loaded = Bm25.load(spark, s"$dir/idx")
    assert(loaded.nDocs == oneShot.nDocs && loaded.avgdl == oneShot.avgdl)
    oneShot.release()
  }

  test("streaming graph ingestion grafts micro-batches into the stored graph") {
    import graft.model.{Doc, Triplet}
    import graft.rag.GraphRag
    import graft.sources.GraphStore

    val store = new GraphStore(spark, Files.createTempDirectory("streamgraft").toString)
    val rag = new GraphRag(spark, store, "sg")
    // seed graph from wave 0 so the stream merges into existing rows
    rag.addDocumentsWithTriplets(Seq(
      Doc("p0", "Einstein developed relativity.",
        Seq(Triplet("Einstein", "developed", "relativity")))))

    val in = Files.createTempDirectory("streamgraft_in").toString + "/docs"
    val wave = Seq(
      Doc("p1", "Einstein won the Nobel prize.",
        Seq(Triplet("Einstein", "won", "Nobel prize"))),
      Doc("p2", "Curie discovered radium.",
        Seq(Triplet("Curie", "discovered", "radium"))))
    spark.createDataset(wave).toDF().select("id", "text", "triplets").write.parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = StreamingOps.foreachBatchGraft(
      spark.readStream.schema(schema).parquet(in), rag.graftDocumentsDf)
    q.awaitTermination(60000); q.stop()

    val stats = store.stats("sg")
    assert(stats("passages") == 3, stats)
    assert(stats("relations") == 3)
    // einstein, relativity, nobel prize, curie, radium
    assert(stats("entities") == 5)
    // adjacency set-merged across the batch boundary
    val einstein = store.table("sg", "entities").filter(col("name") === "einstein")
    assert(einstein.select("passage_ids").head().getSeq[String](0).toSet == Set("p0", "p1"))
    // the streamed content is retrievable
    val r = rag.retrieveNaive("curie discovered radium")
    assert(r.nonEmpty && r.head.id == "p2", r)
  }

  test("streaming micro-batches maintain a saved IVF-PQ index via addSaved") {
    // The maintenance path IvfPq.addSaved exists for: embeddings arrive as a
    // stream, each micro-batch merges into the persisted index, and the
    // final index serves every id exactly once — across batch boundaries,
    // with re-delivered ids (at-least-once sources) deduplicated.
    import graft.operators.IvfPq
    val vecs = (0 until 48).map { i =>
      (i.toString, (0 until 16).map(d => math.sin(i * 31 + d * 7).toFloat))
    }
    val dir = Files.createTempDirectory("ivfpq_stream").toString
    IvfPq.buildAndSave(vecs.take(16).toDF("id", "v"), "id", "v", dir,
      nList = 4, m = 4, dsub = 4, k = 8)
    val in = Files.createTempDirectory("ivfpq_stream_in").toString + "/emb"
    // wave files: overlapping ranges simulate at-least-once re-delivery
    vecs.slice(8, 32).toDF("id", "v").write.parquet(in)
    vecs.slice(24, 48).toDF("id", "v").write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    // maxFilesPerTrigger=1 forces REAL multi-batch processing — without it
    // AvailableNow drains every file in one batch and the cross-batch
    // dedup (addSaved's probe against codes written by an EARLIER stream
    // batch) would never run (r7 review)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfPq.addSaved(spark, dir, batch, "id", "v")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000); q.stop()
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    assert(codes.select("id").distinct().count() == 48)
    assert(codes.groupBy("id", "sub").count().filter(col("count") > 1).isEmpty,
      "re-delivered ids produced duplicate code rows")
    val qdf = vecs.slice(40, 42).toDF("id", "v")
      .select(col("id").as("qid"), col("v").as("qv"))
    val served = IvfPq.searchSaved(spark, dir, qdf, "qid", "qv", nProbe = 4, k = 48)
      .select("neighbor_id").as[String].collect().toSet
    assert(Set("40", "41").subsetOf(served), s"streamed ids not served: $served")
  }

  test("foreachBatch upsert sink merges micro-batches by id, rewriting only affected buckets") {
    import graft.sources.BucketedTable
    val in1 = Files.createTempDirectory("stream_upsert_in1").toString + "/data"
    val in2 = Files.createTempDirectory("stream_upsert_in2").toString + "/data"
    val target = Files.createTempDirectory("stream_upsert_out").toString + "/table"
    val schema = StructType(Seq(StructField("id", StringType), StructField("v", IntegerType)))
    Seq(("a", 1), ("b", 2)).toDF("id", "v").write.parquet(in1)
    val q1 = StreamingOps.foreachBatchUpsert(
      spark.readStream.schema(schema).parquet(in1), target)
    q1.awaitTermination(30000); q1.stop()

    def bucketFiles(): Map[String, Set[String]] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(target)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p) && p.toString.contains("_bucket="))
        .map(_.toString).toSet
        .groupBy(f => f.substring(f.indexOf("_bucket="), f.indexOf("/", f.indexOf("_bucket="))))
    val before = bucketFiles()
    val n = BucketedTable.DefaultBuckets
    // a=1 lands in a different bucket from b and c in the default layout —
    // precondition for the pruning assertion below
    assert(BucketedTable.bucketOf("a", n) != BucketedTable.bucketOf("b", n))
    assert(BucketedTable.bucketOf("a", n) != BucketedTable.bucketOf("c", n))

    // second wave updates b and adds c
    Seq(("b", 20), ("c", 3)).toDF("id", "v").write.parquet(in2)
    val q2 = StreamingOps.foreachBatchUpsert(
      spark.readStream.schema(schema).parquet(in2), target)
    q2.awaitTermination(30000); q2.stop()
    val got = spark.read.parquet(target).drop("_bucket")
      .as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 1, "b" -> 20, "c" -> 3))
    // the micro-batch must NOT have touched a's bucket: its files are identical
    val after = bucketFiles()
    val aBucket = s"_bucket=${BucketedTable.bucketOf("a", n)}"
    assert(after(aBucket) == before(aBucket),
      s"bucket of 'a' was rewritten by a batch that only touched b and c")
    val touched = Set("b", "c").map(id => s"_bucket=${BucketedTable.bucketOf(id, n)}")
    assert(after.keySet.filterNot(before.keySet) ==
      touched.filterNot(before.keySet), "unexpected new bucket dirs")
  }

  test("streaming HLL maintenance: merged registers == one-shot batch registers") {
    import graft.operators.CorpusOps
    val dir = Files.createTempDirectory("stream_hll").toString
    val regPath = s"$dir/registers"
    val all = (0L until 3000L).map(i => (s"g${i % 2}", s"v${i % 700}"))
      .toDF("grp", "value")
    // two waves → two micro-batches (maxFilesPerTrigger=1)
    all.filter($"value" < "v35").write.parquet(s"$dir/in/a")
    all.filter($"value" >= "v35").write.parquet(s"$dir/in/b")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.hllMaintain(stream, Seq("grp"), "value", regPath)
    q.processAllAvailable(); q.stop()
    // mergeability is EXACT: max-merged micro-batch registers must equal the
    // one-shot batch registers over the union — and therefore so must the
    // estimate read from the saved table
    val streamed = spark.read.parquet(regPath)
      .as[(String, Long, Int)].collect().toSet
    val batch = CorpusOps.hllRegisters(all, Seq("grp"), "value")
      .as[(String, Long, Int)].collect().toSet
    assert(streamed == batch)
    val estS = CorpusOps.hllFromRegisters(spark.read.parquet(regPath), Seq("grp"))
      .as[(String, Double)].collect().toMap
    val estB = CorpusOps.hllEstimate(all, Seq("grp"), "value")
      .as[(String, Double)].collect().toMap
    assert(estS == estB)
  }

  test("streaming AMS sketch maintenance: summed state == one-shot z, exactly") {
    import graft.operators.CorpusOps
    val dir = Files.createTempDirectory("stream_ams").toString
    val statePath = s"$dir/state"
    val all = (0L until 4000L).map(i => i % 37).toDF("key")
    all.filter($"key" < 11).write.parquet(s"$dir/in/a")
    all.filter($"key" >= 11 && $"key" < 25).write.parquet(s"$dir/in/b")
    all.filter($"key" >= 25).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.amsMaintain(stream, "key", statePath, nSketches = 8)
    q.processAllAvailable(); q.stop()
    // z is additive across batches (constant signs), so the merged state is
    // BIT-EQUAL to the one-shot sketch — integers, not approximately
    val streamed = spark.read.parquet(statePath)
      .as[(Int, Long)].collect().toMap
    val oneShot = CorpusOps.amsZ(all, "key", 8)
      .as[(Int, Long)].collect().toMap
    assert(streamed == oneShot && streamed.size == 8)
    // and therefore the estimate read from state equals the batch operator's
    val estS = CorpusOps.amsF2FromState(spark.read.parquet(statePath), 8)
      .select("est_f2").as[Long].head()
    val estB = CorpusOps.amsSelfJoinSize(all, "key", 8)
      .select("est_f2").as[Long].head()
    assert(estS == estB)
  }

  test("streaming Count-Min maintenance: summed cells == one-shot; estimates agree") {
    import graft.operators.CorpusOps
    val dir = Files.createTempDirectory("stream_cms").toString
    val statePath = s"$dir/state"
    val all = (0L until 3000L).map(i => s"w${i % 113}").toDF("v")
    all.filter(substring($"v", 2, 10).cast("long") < 40).write.parquet(s"$dir/in/a")
    all.filter(substring($"v", 2, 10).cast("long") >= 40 &&
      substring($"v", 2, 10).cast("long") < 80).write.parquet(s"$dir/in/b")
    all.filter(substring($"v", 2, 10).cast("long") >= 80).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.cmsMaintain(stream, "v", statePath, depth = 4, width = 64)
    q.processAllAvailable(); q.stop()
    // cells are plain counts of a hash partition -> sum-mergeable, bit-equal
    val streamed = spark.read.parquet(statePath)
      .as[(Int, Long, Long)].collect().toSet
    val oneShot = CorpusOps.countMinCells(all, "v", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == oneShot && streamed.nonEmpty)
    // and the probe read from maintained state == the batch operator's
    val probes = Seq("w0", "w7", "w112", "nope").toDF("v")
    val estS = CorpusOps.countMinFromState(spark.read.parquet(statePath),
      probes, "v", depth = 4, width = 64).as[(String, Long)].collect().toMap
    val estB = CorpusOps.countMinEstimate(all, "v", probes, "v",
      depth = 4, width = 64).as[(String, Long)].collect().toMap
    assert(estS == estB)
    // one-sided error on a present key: est >= true count (3000/113 -> 27)
    assert(estS("w7") >= 26)
  }

  test("streaming grouped-KLL maintenance: maintained grouped sketch == one-shot, bit-equal") {
    import graft.operators.QuantileSketch
    val dir = Files.createTempDirectory("stream_kllg").toString
    val statePath = s"$dir/state"
    // skewed groups (one compacts, one never does) + a group that appears
    // ONLY in the last wave (the merge path's absent-side floor)
    val all = ((0L until 1800L).map(i => ("big", i, (i * 13) % 501)) ++
      (0L until 40L).map(i => ("small", 5000L + i, i)) ++
      (0L until 30L).map(i => ("late", 9000L + i, i * 2)))
      .toDF("g", "id", "v")
    all.filter($"id" < 600).write.parquet(s"$dir/in/a")
    all.filter($"id" >= 600 && $"id" < 1500).write.parquet(s"$dir/in/b")
    all.filter($"id" >= 1500).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.kllMaintainByGroup(stream, Seq("g"), "v", "id",
      statePath, cap = 64)
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(statePath)
      .select("g", "_v", "_id", "_h", "_tz", "_level")
      .as[(String, Long, String, Long, Int, Int)].collect().toSet
    val oneShot = QuantileSketch.buildByGroup(all, Seq("g"), "v", "id", cap = 64)
      .select("g", "_v", "_id", "_h", "_tz", "_level")
      .as[(String, Long, String, Long, Int, Int)].collect().toSet
    assert(streamed == oneShot && streamed.nonEmpty)
    // big compacted, small/late kept whole — per-group levels independent
    val lv = streamed.groupBy(_._1).map { case (g, s) => g -> s.head._6 }
    assert(lv("big") > 0 && lv("small") == 0 && lv("late") == 0, lv.toString)
    // and the estimates read from maintained state == the batch board row's
    val estS = QuantileSketch.quantilesFromSketchByGroup(
      spark.read.parquet(statePath), Seq("g"), Seq(50))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val estB = QuantileSketch.quantilesByGroup(all, Seq("g"), "v", "id",
      cap = 64, qPcts = Seq(50)).as[(String, Long, Long, Long, Long)].collect().toSet
    assert(estS == estB)
  }

  test("streaming counting-Bloom maintenance: maintained counters == one-shot net build") {
    import graft.operators.CountingBloom
    val dir = Files.createTempDirectory("stream_cbf").toString
    val statePath = s"$dir/state"
    val m = 1 << 10
    // three CDC waves: wave 1 adds 0..399 (incl. an add+remove of the same
    // key INSIDE the first batch), later waves add more and remove earlier
    // adds — the cross-batch forget path
    val w1 = (0L until 400L).map(i => (i, "add")) :+ (7L, "remove")
    val w2 = (400L until 500L).map(i => (i, "add")) ++
      (0L until 400L by 5L).filter(_ != 7L).map(i => (i, "remove"))
    val w3 = (500L until 520L).map(i => (i, "add")) ++
      (400L until 500L by 3L).map(i => (i, "remove"))
    Seq(w1, w2, w3).zipWithIndex.foreach { case (w, i) =>
      w.toDF("k", "op").write.parquet(s"$dir/in/$i") }
    val stream = spark.readStream.schema(w1.toDF("k", "op").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.countingBloomMaintain(stream, "k", "op", statePath, m = m)
    q.processAllAvailable(); q.stop()
    // net multiset after all waves, built in ONE batch: bit-equal counters
    val all = w1 ++ w2 ++ w3
    val net = all.filter(_._2 == "add").map(_._1)
      .diff(all.filter(_._2 == "remove").map(_._1)) // multiset difference
    val streamed = spark.read.parquet(statePath)
      .select("pos", "cnt", "m", "h", "kt")
      .as[(Int, Long, Int, Int, String)].collect().toSet
    val oneShot = CountingBloom.counters(net.toDF("k"), "k", m)
      .as[(Int, Long, Int, Int, String)].collect().toSet
    assert(streamed == oneShot && streamed.nonEmpty)
    // and the maintained sketch still answers membership with no false
    // negatives on the surviving keys
    val bits = CountingBloom.bitset(spark.read.parquet(statePath))
    assert(net.toDF("k").filter(!CountingBloom.mightContain(bits, $"k")).isEmpty)
  }

  test("streaming KLL maintenance: maintained sketch == one-shot sketch, bit-equal") {
    import graft.operators.QuantileSketch
    val dir = Files.createTempDirectory("stream_kll").toString
    val statePath = s"$dir/state"
    // heavy-tailed values so compaction is non-trivial: 3000 items force
    // several levels at cap=64, split across three waves
    val all = (0L until 3000L).map(i => (i, (i % 100) * (i % 100) + i % 7))
      .toDF("id", "v")
    all.filter($"id" < 1000).write.parquet(s"$dir/in/a")
    all.filter($"id" >= 1000 && $"id" < 2000).write.parquet(s"$dir/in/b")
    all.filter($"id" >= 2000).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.kllMaintain(stream, "v", "id", statePath, cap = 64)
    q.processAllAvailable(); q.stop()
    // the md5-derandomized compactor is a pure function of the multiset with
    // monotone level counts, so maintain == one-shot EXACTLY: same level,
    // same survivor rows, hence identical estimates
    val streamed = spark.read.parquet(statePath)
      .select("_v", "_id", "_h", "_tz", "_level")
      .as[(Long, String, Long, Int, Int)].collect().toSet
    val oneShot = QuantileSketch.build(all, "v", "id", cap = 64)
      .as[(Long, String, Long, Int, Int)].collect().toSet
    assert(streamed == oneShot && streamed.nonEmpty)
    assert(streamed.size <= 64, s"cap violated: ${streamed.size}")
    assert(streamed.map(_._5).head > 0, "expected a non-trivial level at cap=64")
    val estS = QuantileSketch.quantilesFromSketch(
      spark.read.parquet(statePath), Seq(10, 50, 90))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val estB = QuantileSketch.quantiles(all, "v", "id", cap = 64,
      qPcts = Seq(10, 50, 90)).as[(Long, Long, Long, Long)].collect().toSeq
    assert(estS == estB)
  }

  test("streaming collapse-compactor maintenance: bit-equal to the replayed fold, error within the additive bound") {
    import graft.operators.QuantileSketch
    val dir = Files.createTempDirectory("stream_kllc").toString
    val statePath = s"$dir/state"
    val all = (0L until 3000L).map(i => (i, i)).toDF("id", "v")
    // ONE file per wave: the fold replay below must see the exact same
    // micro-batch boundaries (maxFilesPerTrigger=1 batches per FILE, and a
    // multi-part parquet write would split a wave into several batches)
    all.filter($"id" < 1000).repartition(1).write.parquet(s"$dir/in/a")
    all.filter($"id" >= 1000 && $"id" < 2000).repartition(1).write.parquet(s"$dir/in/b")
    all.filter($"id" >= 2000).repartition(1).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.kllCompactMaintain(stream, "v", "id", statePath, cap = 64)
    q.processAllAvailable(); q.stop()
    // mergeCompact is NOT bit-equal to one-shot (each resample adds
    // <= stride/2 rank error — documented, measured below); what IS exact
    // is determinism: the maintained state equals the same fold replayed
    // in batch code, row for row.
    val fold = Seq(s"$dir/in/a", s"$dir/in/b", s"$dir/in/c")
      .map(p => QuantileSketch.compactSketch(spark.read.parquet(p), "v", "id", cap = 64))
      .reduce((st, fresh) => QuantileSketch.mergeCompact(st, fresh, cap = 64))
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select("_v", "_id", "_h", "_r", "_w", "_n", "_s")
        .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSet
    val streamed = canon(spark.read.parquet(statePath))
    assert(streamed == canon(fold) && streamed.nonEmpty)
    assert(streamed.size <= 64, s"cap violated: ${streamed.size}")
    assert(spark.read.parquet(statePath).agg(sum($"_w")).head().getLong(0) == 3000L)
    // measured maintained error vs the exact distribution, against the
    // additive fold bound: batch strides 16/16/16, fold strides 32 and 47
    // => sum/2 = 63.5 ranks of 3000 (~2.1%); print the measured number
    val errs = QuantileSketch.rankError(all, "v",
      QuantileSketch.quantilesFromCompact(
        spark.read.parquet(statePath), Seq(10, 25, 50, 75, 90)))
      .select("rank_err_ppm").as[Long].collect()
    info(f"maintained collapse error: max=${errs.max / 10000.0}%.2f%% " +
      f"mean=${errs.sum / errs.length / 10000.0}%.2f%% (fold bound ~2.1%%)")
    assert(errs.max <= 25000, s"maintained error ${errs.max} ppm exceeds the fold bound")
  }

  test("streaming LSH dedup maintenance: union of emitted pairs == one-shot batch pairs") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("stream_lsh").toString
    // duplicate-heavy corpus: text repeats every 5 ids, split across THREE
    // waves so dup pairs land intra-batch AND cross-batch
    val all = (0L until 60L).map(i => (i, s"the quick document number ${i % 5} body text"))
      .toDF("doc_id", "text")
    all.filter($"doc_id" < 20).write.parquet(s"$dir/in/a")
    all.filter($"doc_id" >= 20 && $"doc_id" < 40).write.parquet(s"$dir/in/b")
    all.filter($"doc_id" >= 40).write.parquet(s"$dir/in/c")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.lshDedupMaintain(stream, "doc_id", "text",
      s"$dir/sigs", s"$dir/pairs")
    q.processAllAvailable(); q.stop()
    val canon = (df: org.apache.spark.sql.DataFrame) => df
      .select(least($"id_a", $"id_b").as("a"), greatest($"id_a", $"id_b").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val streamed = canon(spark.read.parquet(s"$dir/pairs"))
    val oneShot = canon(Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(all, "doc_id", "text", 6, 3), 3, 2))
    assert(streamed == oneShot, s"streamed ${streamed.size} vs batch ${oneShot.size}")
    assert(streamed.nonEmpty) // the fixture must actually produce dups
    // state is signature rows, one per doc ever seen
    assert(spark.read.parquet(s"$dir/sigs").count() == 60L)
  }

  test("stream-stream interval join matches the batch join (watermarked state)") {
    val dir = Files.createTempDirectory("stream_ij").toString
    val ts = (m: Int, s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    val clicks = Seq(
      (1L, ts(0, 0), "c1"), (1L, ts(30, 0), "c2"), (2L, ts(0, 0), "c3"))
      .toDF("user_id", "cts", "click_id")
    val purchases = Seq(
      (1L, ts(5, 0), 10.0),   // within 10 min of c1
      (1L, ts(9, 59), 2.0),   // still within c1's window
      (1L, ts(41, 0), 5.0),   // outside c2's window (30+10 < 41)
      (2L, ts(0, 0), 7.0),    // exactly at c3's open bound
      (3L, ts(1, 0), 9.0))    // no click for this user
      .toDF("user_id", "pts", "value")
    clicks.write.parquet(s"$dir/c"); purchases.write.parquet(s"$dir/p")
    val sc = spark.readStream.schema(clicks.schema).parquet(s"$dir/c")
    val sp = spark.readStream.schema(purchases.schema).parquet(s"$dir/p")
    val q = StreamingOps.intervalJoinStream(sc, sp, "user_id", "cts", "pts",
        windowNanos = 600L * 1000000000L)
      .writeStream.outputMode("append").format("memory").queryName("ij_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ij_out")
      .select("click_id", "value").as[(String, Double)].collect().toSet
    assert(got == Set(("c1", 10.0), ("c1", 2.0), ("c3", 7.0)), got)
  }

  test("streaming anomaly state: merged daily counts equal the batch aggregate exactly") {
    import graft.operators.EventAnalytics
    val dir = Files.createTempDirectory("stream_anom").toString
    val statePath = s"$dir/state"
    val DayNs = 86400000000000L
    // a calm history plus a spike day, split so the SPIKE DAY STRADDLES two
    // micro-batches — the case where per-batch anomaly detection would miss
    // what the merged state catches
    val calm = for (d <- 0L until 9L; i <- 0 until 10) yield ("a", d * DayNs + i * 1000L)
    val spike = (0 until 100).map(i => ("a", 9L * DayNs + i * 1000L))
    val all = (calm ++ spike).toDF("event_type", "ts")
    all.filter($"ts" < 9L * DayNs + 50000L).write.parquet(s"$dir/in/a")
    all.filter($"ts" >= 9L * DayNs + 50000L).write.parquet(s"$dir/in/b")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.anomalyMaintain(stream, "event_type", "ts", statePath)
    q.processAllAvailable(); q.stop()
    // integer counts are additive: streamed state == one-shot aggregate, EXACT
    val streamed = spark.read.parquet(statePath)
      .as[(String, Long, Long)].collect().toSet
    val batch = all.groupBy(col("event_type"), expr(s"ts div $DayNs").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    // and the ev5 read over the state finds the straddled spike day
    val anom = EventAnalytics.anomalousDaysFromDaily(
      spark.read.parquet(statePath).localCheckpoint(true), z = 2.0).collect()
    assert(anom.length == 1 && anom.head.getLong(1) == 9L
      && anom.head.getLong(2) == 100L)
  }

  test("streaming decayed counters: rescale-and-add matches the batch twin") {
    import graft.operators.EventAnalytics
    val dir = Files.createTempDirectory("stream_decay").toString
    val statePath = s"$dir/state"
    val DayNs = 86400000000000L
    // three waves, each advancing the max timestamp, with an out-of-order
    // type ("b") whose later batch carries only OLD events
    val waves: Seq[Seq[(String, Long)]] = Seq(
      (0 until 40).map(i => ("a", i.toLong * DayNs / 20)),
      (0 until 30).map(i => ("b", DayNs + i.toLong * DayNs / 30)),
      // wave 3 mixes fresh "a" events with "b" events OLDER than wave 2's
      // max — the out-of-order case (reference must not regress, old
      // arrivals weight < 1)
      (0 until 20).map(i => ("a", 2L * DayNs + i.toLong * DayNs / 10)) ++
        (0 until 10).map(i => ("b", DayNs / 2 + i.toLong)))
    waves.zipWithIndex.foreach { case (w, i) =>
      w.toDF("event_type", "ts").coalesce(1).write.parquet(s"$dir/in/w$i") }
    val all = waves.flatten.toDF("event_type", "ts")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.decayedMaintain(stream, "event_type", "ts", statePath,
      halfLifeDays = 1.0)
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(statePath)
      .select("event_type", "n_events", "decayed")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val batch = EventAnalytics.decayedCounts(all, "event_type", "ts", 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed.keySet == batch.keySet)
    // counts exact; weights agree to float-rescale tolerance (exponential
    // decay telescopes exactly in real arithmetic, ulps per rescale in IEEE)
    streamed.foreach { case (k, (n, d)) =>
      assert(n == batch(k)._1)
      assert(math.abs(d - batch(k)._2) < 1e-9, s"$k: $d vs ${batch(k)._2}")
    }
    // the reference advanced to the global max
    assert(spark.read.parquet(statePath).select(max("t_ref")).head().getLong(0)
      == all.agg(max("ts")).head().getLong(0))
  }

  test("streaming calibration bins: merged state equals the batch reliability table") {
    import graft.eval.Recall
    val dir = Files.createTempDirectory("stream_calib").toString
    val statePath = s"$dir/state"
    // two waves with DIFFERENT score mixes (wave 2 shifts mass upward), so
    // per-batch tables differ from the merged one — the merge is the test
    val w1 = (0 until 60).map(i => (i / 60.0, if (i % 3 == 0) 1 else 0))
    val w2 = (0 until 40).map(i => (0.5 + i / 80.0, if (i % 2 == 0) 1 else 0))
    w1.toDF("s", "y").coalesce(1).write.parquet(s"$dir/in/w1")
    w2.toDF("s", "y").coalesce(1).write.parquet(s"$dir/in/w2")
    val all = (w1 ++ w2).toDF("s", "y")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.calibrationMaintain(stream, "s", "y", bins = 10, statePath)
    q.processAllAvailable(); q.stop()
    val streamed = StreamingOps.calibrationFromState(spark.read.parquet(statePath))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val batch = Recall.calibrationBins(all, "s", "y", bins = 10)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (bin, (_, n, np, avg, rate)) =>
      val (_, bn, bnp, bavg, brate) = batch(bin)
      assert(n == bn && np == bnp, s"bin $bin") // integer stats EXACT
      assert(rate == brate) // pure-integer division: exact too
      assert(math.abs(avg - bavg) < 1e-12, s"bin $bin avg") // float-sum tolerance
    }
  }

  test("StateTable: rotation is crash-safe and read falls back to .old") {
    import graft.streaming.StreamingOps.StateTable
    val dir = Files.createTempDirectory("statetable").toString
    val path = s"$dir/state"
    assert(StateTable.read(spark, path).isEmpty) // genuinely first batch

    StateTable.overwrite(Seq((1L, "a")).toDF("k", "v"), path)
    assert(StateTable.read(spark, path).get.count() == 1)

    // second overwrite whose plan READS the live state (the maintain-op
    // shape): must not need a pin, must land the merged rows
    val merged = StateTable.read(spark, path).get
      .unionByName(Seq((2L, "b")).toDF("k", "v"))
    StateTable.overwrite(merged, path)
    assert(StateTable.read(spark, path).get.count() == 2)
    // no leftover rotation dirs after a clean overwrite
    assert(!Files.exists(java.nio.file.Paths.get(path + ".tmp")))
    assert(!Files.exists(java.nio.file.Paths.get(path + ".old")))

    // simulate a crash between `path -> .old` and `.tmp -> path`: the live
    // dir is gone but .old holds the last complete state — read recovers it
    Files.move(java.nio.file.Paths.get(path), java.nio.file.Paths.get(path + ".old"))
    val recovered = StateTable.read(spark, path)
    assert(recovered.isDefined && recovered.get.count() == 2, "must fall back to .old")
    // and the next overwrite heals the layout
    StateTable.overwrite(recovered.get.unionByName(Seq((3L, "c")).toDF("k", "v")), path)
    assert(StateTable.read(spark, path).get.count() == 3)
    assert(!Files.exists(java.nio.file.Paths.get(path + ".old")))
  }
}
