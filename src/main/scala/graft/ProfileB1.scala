package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level timing for the b1 BM25 query (dev aid, not a bench). */
object ProfileB1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warmup")(spark.range(1000000L).selectExpr("sum(id)").collect())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs count")(docs.count())
    time("tokenize+explode count")(docs.select(explode(
      graft.functions.Norm.normTokens(col("text"))).as("t")).count())
    val idx = time("Bm25.build (3 checkpoints)")(
      operators.Bm25.build(docs, "doc_id", "text"))
    val queries = spark.createDataFrame(Seq(
      ("q0", "fast vector scan"), ("q1", "spark window agg"),
      ("q2", "customer order join"))).toDF("qid", "qtext")
    time("Bm25.score")(
      operators.Bm25.score(idx, queries, "qid", "qtext", k = 5).count())
    time("Bm25.score again")(
      operators.Bm25.score(idx, queries, "qid", "qtext", k = 5).count())
    spark.stop()
  }
}
