package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Unit semantics for the round-18 changes: the grouped collapse-compactor
  * merge + its maintained streaming form (the sketch square's last quarter),
  * the lshDedupMaintain idempotent re-delivery discipline, the StateTable
  * batchId-regression throw, the join-based IVF delete overload, and the
  * mm4 audio-decode magic gate. */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeCompactByGroup: keep branch lossless per group, deterministic, mass-exact, bounded reads") {
    import graft.operators.QuantileSketch
    // keep branch: two tiny sketches per group — union fits cap, every
    // survivor kept, weights intact, _s = the group's max input stride
    val a = (1L to 30L).map(i => (if (i % 2 == 0) "g1" else "g2", i, i))
      .toDF("g", "id", "v")
    val b = (31L to 60L).map(i => (if (i % 2 == 0) "g1" else "g2", i, i))
      .toDF("g", "id", "v")
    val small = QuantileSketch.mergeCompactByGroup(
      QuantileSketch.compactSketchByGroup(a, Seq("g"), "v", "id", cap = 64),
      QuantileSketch.compactSketchByGroup(b, Seq("g"), "v", "id", cap = 64),
      Seq("g"), cap = 64)
    assert(small.count() == 60)
    val byG = small.groupBy("g").agg(sum($"_w").as("w"), max($"_s").as("s"))
      .as[(String, Long, Long)].collect().map { case (k, w, s) => k -> ((w, s)) }.toMap
    assert(byG("g1") == ((30L, 1L)) && byG("g2") == ((30L, 1L)))
    // resample branch: per-group 2000-item halves at cap 128 resample onto
    // each group's 4000-mass grid; deterministic, mass-exact, additive bound
    val n = 4000L
    val c = (1L to n / 2).flatMap(i => Seq(("p", i, i), ("q", i, i * 2)))
      .toDF("g", "id", "v")
    val d = (n / 2 + 1 to n).flatMap(i => Seq(("p", i, i), ("q", i, i * 2)))
      .toDF("g", "id", "v")
    val sc = QuantileSketch.compactSketchByGroup(c, Seq("g"), "v", "id", cap = 128)
    val sd = QuantileSketch.compactSketchByGroup(d, Seq("g"), "v", "id", cap = 128)
    val m1 = QuantileSketch.mergeCompactByGroup(sc, sd, Seq("g"), cap = 128)
    val m2 = QuantileSketch.mergeCompactByGroup(sc, sd, Seq("g"), cap = 128)
    assert(m1.collect().toSet == m2.collect().toSet) // deterministic
    val sizes = m1.groupBy("g").agg(count(lit(1)).as("m"), sum($"_w").as("w"))
      .as[(String, Long, Long)].collect()
    assert(sizes.length == 2 && sizes.forall { case (_, m, w) => m <= 128 && w == n })
    // per-group read: inputs' stride 16 each, resample stride 32
    // => error <= 8 + 8 + 16 ranks per group (the mergeCompact bound)
    val est = QuantileSketch.quantilesFromCompactByGroup(m1, Seq("g"), Seq(25, 50, 75))
      .select($"g", $"q_pct", $"est").as[(String, Long, Long)].collect()
    est.foreach { case (g, q, e) =>
      val target = math.max(1L, (q * n + 99) / 100)
      val v = if (g == "p") e else e / 2 // q holds 2x values: back to rank space
      assert(math.abs(v - target) <= 32,
        s"group $g q=$q est=$e (rank $v) target=$target outside the additive bound")
    }
  }

  test("kllCompactMaintainByGroup: maintained state bit-equal to the replayed fold, per-group bounds hold") {
    import graft.operators.QuantileSketch
    import graft.streaming.StreamingOps
    val dir = Files.createTempDirectory("stream_kllc_g").toString
    val statePath = s"$dir/state"
    val all = (0L until 3000L).map(i => (if (i % 3 == 0) "a" else "b", i, i))
      .toDF("g", "id", "v")
    // ONE file per wave so the replayed fold sees the same batch boundaries
    all.filter($"id" < 1000).repartition(1).write.parquet(s"$dir/in/w1")
    all.filter($"id" >= 1000 && $"id" < 2000).repartition(1).write.parquet(s"$dir/in/w2")
    all.filter($"id" >= 2000).repartition(1).write.parquet(s"$dir/in/w3")
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val q = StreamingOps.kllCompactMaintainByGroup(
      stream, Seq("g"), "v", "id", statePath, cap = 64)
    q.processAllAvailable(); q.stop()
    val fold = Seq(s"$dir/in/w1", s"$dir/in/w2", s"$dir/in/w3")
      .map(p => QuantileSketch.compactSketchByGroup(
        spark.read.parquet(p), Seq("g"), "v", "id", cap = 64))
      .reduce((st, fresh) =>
        QuantileSketch.mergeCompactByGroup(st, fresh, Seq("g"), cap = 64))
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select("g", "_v", "_id", "_h", "_r", "_w", "_n", "_s")
        .as[(String, Long, String, Long, Long, Long, Long, Long)].collect().toSet
    val streamed = canon(spark.read.parquet(statePath))
    assert(streamed == canon(fold) && streamed.nonEmpty)
    // per-group cap + mass conservation (group a: 1000 items, b: 2000)
    val byG = spark.read.parquet(statePath).groupBy("g")
      .agg(count(lit(1)).as("m"), sum($"_w").as("w"))
      .as[(String, Long, Long)].collect().map { case (g, m, w) => g -> ((m, w)) }.toMap
    assert(byG("a")._1 <= 64 && byG("b")._1 <= 64)
    assert(byG("a")._2 == 1000L && byG("b")._2 == 2000L)
    // measured folded error per group vs the exact distribution, against
    // the additive fold bound (strides per group <= ~16/32/47 over 3 folds
    // => ~2.5% of the group mass; assert with the same headroom as the
    // single-group test)
    val reads = QuantileSketch.quantilesFromCompactByGroup(
      spark.read.parquet(statePath), Seq("g"), Seq(10, 25, 50, 75, 90))
    Seq("a", "b").foreach { g =>
      val errs = QuantileSketch.rankError(
        all.filter($"g" === g), "v",
        reads.filter($"g" === g).select($"q_pct", $"est"))
        .select("rank_err_ppm").as[Long].collect()
      info(f"group $g maintained collapse error: max=${errs.max / 10000.0}%.2f%% " +
        f"mean=${errs.sum / errs.length / 10000.0}%.2f%%")
      assert(errs.max <= 30000, s"group $g error ${errs.max} ppm exceeds the fold bound")
    }
  }

  test("lshDedupApplyBatch: committed replay is a no-op on disk; pre-marker replay rewrites bit-identical content") {
    import graft.operators.Dedup
    import graft.streaming.StreamingOps
    val dir = Files.createTempDirectory("lsh_replay").toString
    val (sigPath, pairsPath) = (s"$dir/sigs", s"$dir/pairs")
    val all = (0L until 40L).map(i => (i, s"the quick document number ${i % 5} body text"))
      .toDF("doc_id", "text")
    def apply(lo: Long, hi: Long, id: Long): Unit =
      StreamingOps.lshDedupApplyBatch(
        all.filter($"doc_id" >= lo && $"doc_id" < hi), id,
        "doc_id", "text", sigPath, pairsPath, 6, 3, 3, 2)
    apply(0, 20, 0L)
    apply(20, 40, 1L)
    def listing(p: String): Set[(String, Long, Long)] = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_)).toArray.map { o =>
        val f = o.asInstanceOf[java.nio.file.Path]
        (root.relativize(f).toString, java.nio.file.Files.size(f),
          java.nio.file.Files.getLastModifiedTime(f).toMillis)
      }.toSet
      finally s.close()
    }
    val before = (listing(sigPath), listing(pairsPath))
    // checkpoint-restart re-delivery of the COMMITTED batch: marker present,
    // so nothing on disk may change — not even timestamps
    apply(20, 40, 1L)
    assert((listing(sigPath), listing(pairsPath)) == before,
      "replay of a committed batch touched the state directories")
    val canonPairs = spark.read.parquet(pairsPath)
      .select(least($"id_a", $"id_b").as("a"), greatest($"id_a", $"id_b").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val oneShot = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(all, "doc_id", "text", 6, 3), 3, 2)
      .select(least($"id_a", $"id_b").as("a"), greatest($"id_a", $"id_b").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(canonPairs == oneShot && canonPairs.nonEmpty)
    val sigRows = spark.read.parquet(sigPath).drop("batch").collect().toSet
    val pairRowCount = spark.read.parquet(pairsPath).count()
    // crash-before-marker: delete batch 1's marker (as if the process died
    // between the writes and the commit) — the replay must rewrite the SAME
    // rows, not append duplicates, and restore the marker
    val marker = new org.apache.hadoop.fs.Path(s"$sigPath/batch=1/_GRAFT_DONE")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false))
    apply(20, 40, 1L)
    assert(fs.exists(marker), "re-applied batch did not restore the commit marker")
    assert(spark.read.parquet(sigPath).drop("batch").collect().toSet == sigRows)
    assert(spark.read.parquet(pairsPath).count() == pairRowCount)
    // total sig state: one row per doc ever seen, across the batch dirs
    assert(spark.read.parquet(sigPath).count() == 40L)
    // a NEW query (fresh checkpoint, ids restarting) pointed at this
    // sigPath delivers DIFFERENT content under a committed batchId: the
    // marker fingerprint mismatches and the batch must throw, not silently
    // skip (the StateTable.alreadyApplied discipline)
    val ex = intercept[IllegalStateException] { apply(0, 10, 1L) }
    assert(ex.getMessage.contains("content differs"))
    assert(spark.read.parquet(sigPath).count() == 40L,
      "the rejected batch must leave the state untouched")
  }

  test("StateTable: a batchId BELOW the stored marker throws instead of silently skipping") {
    import graft.streaming.StreamingOps.StateTable
    val dir = Files.createTempDirectory("state_regress").toString + "/st"
    StateTable.appliedOnce(spark, dir, 5L) { Seq((1L, 10L)).toDF("k", "n") }
    // == is checkpoint replay: skipped quietly
    StateTable.appliedOnce(spark, dir, 5L) { Seq((1L, 99L)).toDF("k", "n") }
    assert(StateTable.read(spark, dir).get.select("n").head().getLong(0) == 10L)
    // < is an id regression (a NEW query pointed at an EXISTING state path):
    // loud failure, state untouched
    val e = intercept[IllegalStateException] {
      StateTable.appliedOnce(spark, dir, 2L) { Seq((1L, 77L)).toDF("k", "n") }
    }
    assert(e.getMessage.contains("OLDER"))
    assert(StateTable.read(spark, dir).get.select("n").head().getLong(0) == 10L)
    assert(StateTable.lastBatchId(spark, dir).contains(5L))
  }

  test("IvfIndex.deleteSaved DataFrame overload: join-based delta, same semantics as the Seq form") {
    import graft.operators.IvfIndex
    val dir = Files.createTempDirectory("ivf_del_df").toString
    val emb = (0 until 60).map(i =>
      (i.toString, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toDouble)))
      .toDF("vec_id", "embedding")
    IvfIndex.save(IvfIndex.build(emb, "vec_id", "embedding", nList = 4), dir)
    // delete via a DataFrame delta (dup rows + unknown ids tolerated)
    val del = Seq("1", "2", "2", "99999").toDF("the_id")
    IvfIndex.deleteSaved(spark, dir, del, "the_id")
    val left = IvfIndex.load(spark, dir).assignments
      .select("id").as[String].collect().toSet
    assert(left == (0 until 60).map(_.toString).toSet -- Set("1", "2"))
    // and the Seq overload still routes through the same path
    IvfIndex.deleteSaved(spark, dir, Seq("3"))
    assert(IvfIndex.load(spark, dir).assignments.count() == 57)
  }

  test("mm4 decode arm is magic-gated: the board row can never flip decoded=true") {
    import graft.operators.Multimodal
    // a ".snd"-prefixed text payload reaches the decode attempt (magic
    // matches) but fails the parse -> fallback, decoded=false; a plain text
    // never even reaches AudioSystem
    val assets = Seq(
      ("a", "audio", ".snd but definitely not audio data".getBytes("UTF-8")),
      ("b", "audio", "plain text with no container magic".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "payload")
    val fp = Multimodal.audioFingerprint(assets)
      .select("asset_id", "decoded").as[(String, Boolean)].collect().toMap
    assert(fp == Map("a" -> false, "b" -> false))
    // the board row's construction: magic-prefixed texts are excluded on
    // both engines, so every surviving row is the fallback arm
    val row = SparkEntry.queries("mm4_audio_fingerprint")(spark, "/root/testdata/sf0.001")
    assert(row.filter($"decoded").isEmpty, "mm4 produced a decoded=true row")
    assert(row.count() > 0)
  }
}
