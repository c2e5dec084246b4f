package graft

import org.apache.spark.sql.SparkSession

/** Timing harness for the contrastive-mining family (sim2/4/6/7/8): runs each
  * query N times inside ONE warm JVM against a noop sink and prints medians —
  * the only way to see real per-query cost on this box (single-JVM bench noise
  * is ±40%, and cross-JVM comparisons additionally confound JIT state).
  *
  *   sbt "runMain graft.ProfileSims /root/testdata/sf0.1 3"
  */
object ProfileSims {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("sim8_knn_density", "sim4_label_agreement",
      "sim6_mutual_knn", "sim2_hard_negatives", "sim7_triplet_mine")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-22s reps=${ts.map(t => f"$t%.2f").mkString(",")} median=${ts.sorted.apply(reps / 2)}%.2f")
    }
    spark.stop()
  }
}
