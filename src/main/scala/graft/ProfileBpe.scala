package graft

import graft.operators.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing evidence for the BPE training regimes: the driver-local merge loop
  * vs the distributed one. A real tokenizer is 30k–100k merges; the
  * distributed loop costs ~2 driver-scheduled jobs per merge, so its
  * wall-clock is job-count-bound long before any single job is large — the
  * local loop (default [[Bpe.train]] path once the vocabulary-sized word
  * table fits the driver) is the regime fix.
  *
  * Usage: runMain graft.ProfileBpe [sfDir] [numMerges]
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wf = Bpe.wordFrequencies(
      docs.select(graft.functions.Norm.normTokens(col("text")).as("toks")), "toks")
      .localCheckpoint(true)
    println(s"[bpe] vocab=${wf.count()} words, merges=$numMerges")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bpe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val local = time(s"trainLocal   x$numMerges")(Bpe.train(wf, numMerges))
    // distributed at 1/20th the merges — extrapolate, don't wait
    val distMerges = math.max(1, numMerges / 20)
    val dist = time(s"trainDistributed x$distMerges")(Bpe.trainDistributed(wf, distMerges))
    require(local.take(distMerges) == dist,
      "local and distributed merge lists diverge — see BpeSpec property test")
    println(s"[bpe] first merges agree: ${local.take(5)}")
    spark.stop()
  }
}
