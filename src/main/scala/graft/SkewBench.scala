package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the d4-vs-d18 CROSSOVER claim: the full posting-list
  * join (`ngramJaccardPairs`, d4) wins on benign shingle distributions,
  * the prefix-filtered join (`prefixFilteredJaccardPairs`, d18/PPJoin)
  * wins under hot-shingle skew — because d4's self-join fans out df² rows
  * per shingle while d18's prefix structurally excludes hot tokens (they
  * sort to the suffix under the rarest-first order and never enter the
  * join). README records d18 LOSING at sf0.1's benign distribution; this
  * main produces the other half of the claim as a measured number instead
  * of an argument.
  *
  * The skewed corpus derives from the driver's own documents table — no
  * synthetic rows, just the real-world failure shape injected: ~30% of
  * documents get one shared boilerplate header (the repeated licence
  * banner / site nav / disclaimer every web crawl actually contains),
  * giving ~38 shingles with df ≈ 0.3·N. That is exactly the join-skew
  * shape `cs7_skew_report` exists to warn about: at df = 1500 one hot
  * shingle alone is 1500²/2 ≈ 1.1M join rows for d4.
  *
  * Both algorithms run from the SAME pinned distinct (id, sh) frame (the
  * shingle build is identical infrastructure, not part of the contrast)
  * and must return the SAME pair count (two algorithms, one answer — the
  * d4/d18 oracle contract, asserted here too).
  *
  * Output: one JSON line {"corpus", "n_docs", "d4_sec", "d18_sec",
  * "n_pairs", "hot_df"} per corpus (plain, skewed).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    // 56 words → 54 hot 3-shingles: sized to stay OUT of every prefix.
    // The prefix excludes a doc's h hot shingles only while h ≤ ⌈t·sz⌉ − 1
    // (they must all fit in the suffix); the smallest docs taking the
    // header here have ~65 organic shingles, so h = 54 ≤ ⌈119/2⌉ − 1 = 59
    // holds corpus-wide. A header past that bound leaks into prefixes and
    // the candidate join inherits the skew — measured: an 84-word header
    // on ≥50-organic-shingle docs put d18 at 48 s vs d4's 20 s. PPJoin's
    // structural-skew-immunity claim is CONDITIONAL on boilerplate being a
    // minority of each document — true of licence banners on articles,
    // false of banners pasted onto tweets.
    val boiler = ("this site and all contents are provided as is without " +
      "warranty of any kind either express or implied including but not " +
      "limited to the implied warranties of merchantability and fitness " +
      "for a particular purpose all rights reserved " +
      "no part of this publication may be reproduced distributed or " +
      "transmitted in any form or by any means without the prior " +
      "written permission of the publisher").trim // 56 words

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .repartition(spark.sparkContext.defaultParallelism)

    def run(name: String, df: DataFrame): Unit = {
      // one shingle build, pinned, shared by both contestants — and fully
      // materialized BEFORE either clock starts
      val sh = Dedup.shingleRows(df, "doc_id", "text", 3)
        .distinct().localCheckpoint(true)
      val nDocs = df.count()
      val hotDf = sh.groupBy("sh").count().agg(max("count")).head().getLong(0)
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // warm both paths once at tiny scale so neither pays first-run codegen
      val tiny = sh.filter(col("id") < 20).localCheckpoint(true)
      Dedup.ngramJaccardPairsFromShingles(tiny, 0.5, 1000000L).count()
      Dedup.prefixFilteredJaccardPairs(tiny, 0.5).count()
      // 3 reps, median: single-shot numbers on this box swing ±40% (the
      // same in-suite-vs-warm-twin drift BENCH documents), which is larger
      // than the effect under measurement
      def median3(f: => Long): (Double, Long) = {
        val rs = Seq.fill(3)(time(f))
        (rs.map(_._1).sorted.apply(1), rs.head._2)
      }
      val (t4, n4) = median3(
        Dedup.ngramJaccardPairsFromShingles(sh, 0.5, 1000000L).count())
      val (t18, n18) = median3(
        Dedup.prefixFilteredJaccardPairs(sh, 0.5).count())
      require(n4 == n18, s"answer mismatch: d4=$n4 d18=$n18") // one answer
      println(f"""{"corpus": "$name", "n_docs": $nDocs, "hot_df": $hotDf, """ +
        f""""d4_sec": $t4%.2f, "d18_sec": $t18%.2f, "n_pairs": $n4}""")
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(sh)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(tiny)
    }

    // 17 words → 15 hot shingles for mid-size docs: the same prefix bound
    // (15 ≤ ⌈(24+15)/2⌉ − 1 = 19 for the smallest ~24-organic-shingle doc
    // taking it) at a much higher df.
    val nav = ("home about products services news events careers contact " +
      "privacy policy terms of use sitemap search login register").trim

    // TWO disjoint header tiers, each sized to its documents' organic
    // shingle count so the prefix bound holds corpus-wide: the 56-word
    // licence banner on long docs (n_chars > 400, ~29% ⇒ df ≈ 1440) and a
    // 17-word nav strip on mid docs (150 < n_chars ≤ 400, ~52% ⇒ df ≈
    // 2600). Pairs sharing ONLY a header stay far below the 0.5 threshold
    // (J ≲ 0.30), so the ANSWER is unchanged — only the JOIN hardens:
    // d4's posting join pays Σ_hot df²/2 ≈ 56M + 49M extra rows; d18's
    // prefixes exclude every hot shingle by construction. Injecting into
    // SHORT docs instead would make the header itself thousands of
    // qualifying near-dup pairs — a bigger answer both algorithms rightly
    // pay for, not a harder join that only d4 does.
    run("plain", docs.select(col("doc_id"), col("text")))
    run("skewed", docs.withColumn("text",
        when(col("n_chars") > 400, concat(lit(boiler), lit(" "), col("text")))
          .when(col("n_chars") > 150, concat(lit(nav), lit(" "), col("text")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("text")))

    // --- fi1 vs fi2 (r14): A-priori pair counting vs the PCY bucket prune
    // under an injected HOT BASKET — the real-world failure shape is a
    // default/unknown basket key absorbing unrelated rows (the order-log
    // twin of the boilerplate header above): every ~500th order's lines
    // collapse into basket 0, one basket with ~10³ distinct items emitting
    // ~10⁶/2 candidate pairs of support 1. Both algorithms pay the explode
    // (quadratic in basket size, by contract); what PCY changes is the
    // pair-count SHUFFLE, which drops the hapax tail at the light-bucket
    // semi-join (84% of candidates at sf0.01, measured). Both must return
    // the SAME pairs — asserted. Single-JVM caveat applies: local shuffles
    // are memory-speed, so fi2's second explode can outweigh the shuffle
    // saving here even where a network-shuffle cluster flips the sign.
    {
      import graft.operators.FrequentItemsets
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      // Shuffle accountant: PCY optimizes shuffle VOLUME (the candidate
      // pairs that never reach the pair-count exchange), not single-JVM
      // seconds — so the adjudication reports the metric the algorithm
      // actually targets, measured from task shuffle-write metrics, beside
      // the honest wall-time numbers.
      val tally = new org.apache.spark.scheduler.SparkListener {
        val bytes = new java.util.concurrent.atomic.AtomicLong
        val records = new java.util.concurrent.atomic.AtomicLong
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      }
      spark.sparkContext.addSparkListener(tally)
      // One measured run of `f`'s shuffle writes: reset, run, drain the
      // async listener bus so every task's metrics have landed, read.
      def shuffleOf(f: => Long): (Long, Long) = {
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext)
        tally.bytes.set(0L); tally.records.set(0L)
        f
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext)
        (tally.bytes.get(), tally.records.get())
      }
      def runFi(name: String, bk: DataFrame): Unit = {
        val b = bk.localCheckpoint(true)
        val hotSize = b.groupBy("l_orderkey").count().agg(max("count"))
          .head().getLong(0)
        def time(f: => Long): (Double, Long) = {
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        def median3(f: => Long): (Double, Long) = {
          val rs = Seq.fill(3)(time(f))
          (rs.map(_._1).sorted.apply(1), rs.head._2)
        }
        val (t1, n1) = median3(FrequentItemsets.frequentPairs(
          b, "l_orderkey", "l_partkey", minSupport = 2L).count())
        val (t2, n2) = median3(FrequentItemsets.pcyFrequentPairs(
          b, "l_orderkey", "l_partkey", minSupport = 2L).count())
        // One answer — content-equal, not merely count-equal: an order-free
        // bit_xor over a row hash of every output column catches equal
        // cardinality with different pairs (or supports), which a bare
        // count comparison would wave through.
        def chk(df: DataFrame): Long = df.selectExpr(
          "bit_xor(xxhash64(item_a, item_b, support)) AS c").head().getLong(0)
        val c1 = chk(FrequentItemsets.frequentPairs(
          b, "l_orderkey", "l_partkey", minSupport = 2L))
        val c2 = chk(FrequentItemsets.pcyFrequentPairs(
          b, "l_orderkey", "l_partkey", minSupport = 2L))
        require(n1 == n2 && c1 == c2,
          s"answer mismatch: fi1=($n1, $c1) fi2=($n2, $c2)")
        // Surgical shuffle metering: the shared A-priori front (distinct +
        // level-1 prune) is identical infrastructure — materialize it ONCE
        // outside the meter, then measure each algorithm's kernel alone.
        // fi1's kernel shuffle = candidate join + the pair-count exchange;
        // fi2's = the same join TWICE + the bucket exchange + the pruned
        // pair exchange. The candidate-drop%% is what the semi-join removes
        // from the pair exchange — PCY's actual target.
        val (ic, nBf, prunedRaw) = FrequentItemsets.prunedBasketItems(
          b, "l_orderkey", "l_partkey", 2L, None)
        val pruned = prunedRaw.localCheckpoint(true)
        val (b1, r1) = shuffleOf(
          FrequentItemsets.pairCount(pruned, 2L).count())
        val (b2, r2) = shuffleOf(
          FrequentItemsets.pcyPairCount(pruned, 2L, 1 << 20).count())
        val candTotal = FrequentItemsets.candidatePairs(pruned).count()
        val candKept = FrequentItemsets.pcyCandidates(pruned, 2L, 1 << 20).count()
        val dropPct = if (candTotal == 0) 0.0
          else 100.0 * (candTotal - candKept) / candTotal
        nBf.unpersist() // no-op (lazy aggregate); silences the unused warning
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(pruned)
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(ic)
        println(f"""{"corpus": "$name", "hot_basket_rows": $hotSize, """ +
          f""""fi1_sec": $t1%.2f, "fi2_sec": $t2%.2f, "n_pairs": $n1, """ +
          f""""fi1_shuffle_mb": ${b1 / 1048576.0}%.2f, "fi2_shuffle_mb": ${b2 / 1048576.0}%.2f, """ +
          f""""fi1_shuffle_records": $r1, "fi2_shuffle_records": $r2, """ +
          f""""candidates": $candTotal, "pcy_candidate_drop_pct": $dropPct%.1f}""")
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(b)
        System.gc()
      }
      runFi("fi-plain", li)
      runFi("fi-hotbasket", li.withColumn("l_orderkey",
        when(col("l_orderkey") % 500 === 0, lit(0L)).otherwise(col("l_orderkey"))))
    }
    spark.stop()
  }
}
