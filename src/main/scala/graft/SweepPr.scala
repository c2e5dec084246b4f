package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Measures the PageRank broadcast-loop vs GraphX crossover
  * ([[graft.operators.PageRank.run]]'s `maxBroadcastNodes`) instead of
  * asserting it (r18 verdict #5 — the SweepMaintain precedent): over
  * synthetic degree-8 graphs of growing node count, time the DataFrame
  * broadcast-iteration path against [[graft.operators.PageRank.runBig]]
  * (GraphX, co-partitioned, nothing broadcast) — identical semantics by
  * construction (runBig implements the same recurrence; the equality is
  * spec-pinned), so the sweep chooses cost, never answers. A path that
  * dies (OOM / broadcast failure) at a size is reported as died — that IS
  * the crossover datum on this box's heap.
  *
  * Usage: SPARK_DRIVER_MEM=24g runMain graft.SweepPr [maxMillions...]
  * — prints one [pr-sweep] line per (n, path) and a closing JSON line;
  * README/OPTIMIZATION notes cite the run and the maxBroadcastNodes
  * default cites the table. */
object SweepPr {
  def main(args: Array[String]): Unit = {
    val sizesM: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(1, 2, 4, 8, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val PR = graft.operators.PageRank

    def edges(n: Long) = spark.range(n).toDF("src")
      .select(col("src"), explode(sequence(lit(1), lit(8))).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j")), lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // warm both code paths once (JIT/codegen — the Bench rationale)
    PR.run(edges(100000L), iterations = 3).count()
    PR.runBig(edges(100000L), iterations = 3).count()

    def timed(name: String, n: Long)(body: => Long): (Double, Long) =
      try {
        val t0 = System.nanoTime()
        val rows = body
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[pr-sweep] n=${n}%,d $name%-10s $sec%8.2f s rows=$rows")
        (sec, rows)
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[pr-sweep] n=$n $name DIED: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
          (-1.0, -1L)
      }

    val rows = sizesM.map { m =>
      val n = m * 1000000L
      val e = edges(n).localCheckpoint(true) // shared by both contestants
      val (tb, _) = timed("broadcast", n) {
        PR.run(e, iterations = 3, maxBroadcastNodes = Long.MaxValue).count()
      }
      System.gc()
      val (tg, _) = timed("graphx", n) { PR.runBig(e, iterations = 3).count() }
      System.gc()
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(e)
      (n, tb, tg)
    }
    spark.stop()
    val qjson = rows.map { case (n, tb, tg) =>
      s""""$n":{"broadcast_sec":${math.round(tb * 1000) / 1000.0},""" +
        s""""graphx_sec":${math.round(tg * 1000) / 1000.0}}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"pr_crossover_sweep","iterations":3,"degree":8,""" +
      s""""heap":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","points":$qjson}""")
  }
}
