package graft

// One-shot config sweep for the IVF-PQ recall floor (VERDICT r11 item #6):
// which (m, dsub, k, pqIters) lifts the raw-ADC k@10 curve on the bench
// embeddings, and what the exact-refine path recovers on top. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SweepPq"
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import scala.util.control.NonFatal

object SweepPq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val configs = Seq(
      // (m, dsub, k, pqIters)
      (16, 4, 128, 2),  // current bench default
      (16, 4, 128, 8),  // more Lloyd refinement
      (16, 4, 256, 2),  // bigger codebooks
      (16, 4, 256, 8),
      (32, 2, 128, 2),  // finest subspaces
      (32, 2, 256, 8))
    configs.foreach { case (m, dsub, k, it) =>
      try {
        val dir = java.nio.file.Files.createTempDirectory("pq_sweep").toString
        val t0 = System.nanoTime()
        graft.operators.IvfPq.buildAndSave(emb, "vec_id", "embedding", dir,
          nList = 32, m = m, dsub = dsub, k = k, pqIters = it)
        val buildS = (System.nanoTime() - t0) / 1e9
        val raw = graft.operators.IvfPq.recallCurve(spark, dir, emb, queries,
          "vec_id", "embedding", "vec_id", "embedding", k = 10, nProbes = Seq(8, 32))
        val ref = graft.operators.IvfPq.recallCurveRefined(spark, dir, emb, queries,
          "vec_id", "embedding", "vec_id", "embedding", k = 10,
          nProbes = Seq(8, 32), refine = 4)
        println(f"[pq-sweep] m=$m dsub=$dsub k=$k iters=$it build=$buildS%.1fs raw " +
          raw.map { case (p, r) => f"nProbe=$p:$r%.3f" }.mkString(" ") +
          " refine=4 " + ref.map { case (p, r) => f"nProbe=$p:$r%.3f" }.mkString(" "))
      } catch { case NonFatal(e) => println(s"[pq-sweep] m=$m dsub=$dsub k=$k iters=$it FAILED: $e") }
    }
    spark.stop()
  }
}
