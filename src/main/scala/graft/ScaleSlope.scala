package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Scaling-slope harness (r16): measures t(10x)/t(1x) for the suite's
  * heaviest rows, turning the "would this hold at 100x" plan-shape argument
  * into a number. A ~10x ratio on 10x data is the linear signature; >>10x
  * names a hidden quadratic or a saturated structure (fi2's bucket table is
  * the known case — its A/B twin fi1 exists for exactly that adjudication).
  *
  * The 10x corpus is 10 key-shifted copies of the sf0.1 tables (copy k
  * shifts every scaling key by k*1e8, so referential integrity holds within
  * a copy and copies never collide), with two content transforms that keep
  * the INTERNAL structure of each copy while preventing artificial
  * cross-copy duplicates:
  *  - documents.text gets a per-copy alphanumeric token suffix (`q<k>`),
  *    so each copy has its own disjoint vocabulary/shingle space — dup
  *    clusters, co-occurrence graphs and token statistics replicate
  *    per-copy instead of collapsing into 10-way near-dup clusters that a
  *    real 10x crawl would not contain;
  *  - embeddings rotate circularly by k positions (norms and pairwise
  *    structure within a copy preserved, cross-copy neighborhoods changed).
  * Dimension tables (region, nation) stay fixed, as they would at any
  * scale. Both readings run STANDALONE (shared index builds included on
  * both sides), which is the honest numerator/denominator for a slope.
  *
  * Usage: runMain graft.ScaleSlope [baseDir] [bigDir] — synthesizes bigDir
  * once (skipped if present), warm-passes at sf0.001, then times each row
  * at 1x and 10x. Stderr: one [scale-slope] line per query + a summary. */
object ScaleSlope {

  private val OFF = 100000000L

  private val DEFAULT_QUERIES = Seq(
    "rag_pipeline", "x39_textrank", "pipe3_topic_dedup", "d18_prefix_jaccard",
    "fi1_frequent_pairs", "fi2_pcy_pairs", "p4_degree2", "bt1_bradley_terry",
    "g14_hits", "pr1_pagerank",
    // the r16 additions, measured on the same footing
    "cs11_kll_quantiles", "cs12_kll_grouped", "s12_removable_membership",
    "bf1_bloom_semijoin",
    // r17: every row that read >10x in the r16 FULL-suite 10x run — the
    // "linear band explained by in-suite box saturation" bracket rested on
    // one cross-check (pr1); these standalone readings close it per row
    "m10_calibration", "x32_signal_corr", "m6_pr_curve", "d7_line_dedup",
    "d16_dup_by_source", "pipe1_corpus", "b7_spell_correct", "nb1_nb_model",
    "x11_vocab", "g1_explode", "x15_weighted_sample", "pk1_sequence_pack",
    "mk1_mink_prob",
    // r17 additions, same footing as the r16 ones
    "cs13_kll_compact", "cs14_kll_compact_grouped", "pipe4_cdc_decontam",
    "mm4_audio_fingerprint")

  def synthesize(spark: SparkSession, baseDir: String, outDir: String): Unit = {
    // key-shift precondition (r17 advice): copies collide SILENTLY if any
    // scaling key reaches the shift offset — skewing every published slope —
    // so refuse loudly instead. ONE aggregate per table (review finding:
    // the first cut scanned events twice and embeddings twice); a NULL max
    // is refused too — an all-NULL cast means the key column's dtype
    // drifted, and `shift` would then corrupt the corpus silently.
    val keyCols = Seq(
      "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey"), "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"))
    keyCols.foreach { case (tbl, ks) =>
      val row = spark.read.parquet(s"$baseDir/$tbl.parquet")
        .agg(max(col(ks.head).cast("long")),
          ks.tail.map(k => max(col(k).cast("long"))): _*).head()
      ks.zipWithIndex.foreach { case (k, i) =>
        require(!row.isNullAt(i),
          s"ScaleSlope: $tbl.$k max is NULL after cast to long — key dtype " +
            "drifted; shifting would corrupt the synthesized corpus")
        require(row.getLong(i) < OFF,
          s"ScaleSlope: $tbl.$k max ${row.getLong(i)} >= shift offset $OFF — " +
            "copies would collide; raise OFF")
      }
    }
    def copies(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$baseDir/$name.parquet")
      (0 until 10).map(k => f(base, k)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scale-synth] $name x10 written")
    }
    def shift(c: String, k: Int) = col(c) + lit(k * OFF)
    // dimensions: fixed at any scale
    Seq("region", "nation").foreach { n =>
      spark.read.parquet(s"$baseDir/$n.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }
    copies("customer")((df, k) => df.withColumn("c_custkey", shift("c_custkey", k)))
    copies("supplier")((df, k) => df.withColumn("s_suppkey", shift("s_suppkey", k)))
    copies("part")((df, k) => df.withColumn("p_partkey", shift("p_partkey", k)))
    copies("orders")((df, k) => df
      .withColumn("o_orderkey", shift("o_orderkey", k))
      .withColumn("o_custkey", shift("o_custkey", k)))
    copies("lineitem")((df, k) => df
      .withColumn("l_orderkey", shift("l_orderkey", k))
      .withColumn("l_partkey", shift("l_partkey", k))
      .withColumn("l_suppkey", shift("l_suppkey", k)))
    copies("events")((df, k) => df
      .withColumn("event_id", shift("event_id", k))
      .withColumn("user_id", shift("user_id", k)))
    copies("documents")((df, k) => {
      val salted = if (k == 0) df else df.withColumn("text",
        regexp_replace(col("text"), "(\\w+)", "$1q" + k))
      salted.withColumn("doc_id", shift("doc_id", k))
        .withColumn("n_chars", length(coalesce(col("text"), lit(""))).cast("long"))
    })
    // embedding dim DERIVED from the data (r17 advice): a hardcoded 64 would
    // silently mis-slice rotated vectors if the corpus dim ever changes
    val dim = spark.read.parquet(s"$baseDir/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    copies("embeddings")((df, k) => {
      val rot = if (k == 0) col("embedding") else concat(
        slice(col("embedding"), k + 1, dim - k), slice(col("embedding"), 1, k))
      df.withColumn("embedding", rot).withColumn("vec_id", shift("vec_id", k))
    })
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigDir = args.drop(1).headOption.getOrElse("/tmp/graft_sf0.1_x10")
    // args 3+ = query-name filter for incremental measurement (the default
    // list otherwise); synthesis is unaffected
    val QUERIES =
      if (args.length > 2) DEFAULT_QUERIES.filter(args.drop(2).toSet)
      else DEFAULT_QUERIES
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(bigDir)))
      synthesize(spark, baseDir, bigDir)
    else System.err.println(s"[scale-synth] reusing $bigDir")
    // steady-state warm-up (the Bench rationale: measure the engine, not
    // JIT) on the smallest sibling of baseDir so any data layout works
    val warmDir = new java.io.File(baseDir).getParent + "/sf0.001"
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir)))
      QUERIES.foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case NonFatal(e) => System.err.println(s"[scale-warm] $n: $e") }
      }
    else System.err.println(s"[scale-warm] no $warmDir — first 1x readings " +
      "will absorb JIT/codegen cost; treat early slopes as upper bounds")
    def timed(name: String, dir: String): (Double, Long) = {
      val pre = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val rows = try SparkEntry.queries(name)(spark, dir).count()
        catch { case NonFatal(e) =>
          System.err.println(s"[scale-slope] $name failed on $dir: $e"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => pre.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      System.gc()
      (sec, rows)
    }
    val results = QUERIES.map { name =>
      val (t1, r1) = timed(name, baseDir)
      val (t10, r10) = timed(name, bigDir)
      // only SUCCESSFUL runs may publish a ratio (the Bench warm-twin rule):
      // t1 is wall-clock and positive even when the query threw, so the
      // guard must be on the rows=-1 failure sentinel, not the time
      val ratio = if (r1 >= 0 && r10 >= 0 && t1 > 0) t10 / t1 else -1.0
      System.err.println(f"[scale-slope] $name t1=$t1%.2fs ($r1 rows) " +
        f"t10=$t10%.2fs ($r10 rows) ratio=$ratio%.1fx")
      (name, t1, t10, ratio, r1, r10)
    }
    // raw Double interpolation, not %f: locale-dependent formatting would
    // emit comma decimals — unparseable JSON on a comma-decimal JVM
    def r3(x: Double): Double = math.round(x * 1000) / 1000.0
    val qjson = results.map { case (n, t1, t10, r, _, _) =>
      s""""$n":{"t1":${r3(t1)},"t10":${r3(t10)},"ratio":${r3(r)}}""" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"scale_slope","queries":$qjson,"base":"$baseDir","big":"$bigDir"}""")
  }
}
