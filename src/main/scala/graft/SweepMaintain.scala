package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Measures the counting-Bloom maintain-vs-rebuild crossover
  * ([[graft.operators.CountingBloom.chooseMaintain]]) instead of asserting
  * it (r16 verdict #6): over the sf0.1 lineitem key multiset (~600k
  * composite keys), sweep the removed fraction f and time
  * `maintain(state, added = ∅, removed)` against `counters(v2)` — both
  * producing IDENTICAL counters (the operator's own guarantee), so this
  * chooses cost, never semantics. The pre-existing state is persisted to
  * parquet first and read back, as a real pipeline's would be, so the
  * maintain timings don't absorb the build they exist to avoid.
  *
  * Usage: runMain graft.SweepMaintain [sfDir] — prints one
  * [maintain-sweep] line per fraction and a closing JSON line; the README
  * table cites the run and the chooseMaintain constant cites the table. */
object SweepMaintain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import org.apache.spark.sql.graft.Bridge
    val CB = graft.operators.CountingBloom

    val keys = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("k"))
      .localCheckpoint(true)
    val n = keys.count()
    // deterministic removal buckets: md5 percentile of the key
    val bucket = pmod(graft.functions.Hashing.md5Long(col("k")), lit(100L))
    val stateDir = java.nio.file.Files.createTempDirectory("sweep_cb").toString
    CB.counters(keys, "k").write.mode("overwrite").parquet(s"$stateDir/state")
    // warm both code paths once (JIT/codegen — the Bench rationale)
    CB.maintain(spark.read.parquet(s"$stateDir/state"),
      keys.limit(0), keys.filter(bucket < 1), "k").count()
    CB.counters(keys.filter(bucket >= 1), "k").count()

    def timed(body: => Long): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    val fractions = Seq(5, 10, 20, 30, 40, 50, 60)
    val rows = fractions.map { f =>
      val removed = keys.filter(bucket < f).localCheckpoint(true)
      val v2 = keys.filter(bucket >= f).localCheckpoint(true)
      try {
        val nDel = removed.count()
        val nNew = v2.count()
        val state = spark.read.parquet(s"$stateDir/state")
        val tM = timed(CB.maintain(state, keys.limit(0), removed, "k").count())
        val tR = timed(CB.counters(v2, "k").count())
        val ratio = nDel.toDouble / math.max(nNew, 1L)
        System.err.println(f"[maintain-sweep] removed=$f%d%% delta/new=$ratio%.3f " +
          f"maintain=$tM%.2fs rebuild=$tR%.2fs winner=${if (tM < tR) "maintain" else "rebuild"}%s")
        (f, ratio, tM, tR)
      } finally { Bridge.unpersistCheckpoint(removed); Bridge.unpersistCheckpoint(v2) }
    }
    Bridge.unpersistCheckpoint(keys)
    def r3(x: Double): Double = math.round(x * 1000) / 1000.0
    val json = rows.map { case (f, ratio, tM, tR) =>
      s"""{"removed_pct":$f,"delta_ratio":${r3(ratio)},"maintain_s":${r3(tM)},"rebuild_s":${r3(tR)}}"""
    }.mkString("[", ",", "]")
    spark.stop()
    println(s"""{"metric":"maintain_sweep","n_keys":$n,"points":$json,"sf":"$sfDir"}""")
  }
}
