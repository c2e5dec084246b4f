package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the p4_degree2 expansion — dev harness (same session
  * shape as [[Bench]]). */
object ProfileP4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[p4] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      System.err.println(s"[p4] ---- round $round")
      val er = time("checkpoint er") {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_partkey").cast("string").as("entity_id"),
            col("l_orderkey").cast("string").as("relation_id"))
          .localCheckpoint(true)
      }
      val seeds = er.filter(col("entity_id").cast("long") % 211 === 0)
        .select("entity_id").distinct()
      val emptyRel = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("relation_id",
            org.apache.spark.sql.types.StringType))))
      val sub = time("expand total") {
        val s = graft.operators.SubgraphExpansion.expand(seeds, emptyRel, er, degree = 2)
        s.history.foreach(h => System.err.println(
          s"[p4]   degree ${h.degree}: entities=${h.entityCount} relations=${h.relationCount}"))
        s
      }
      time("final count")(sub.entityIds.count())
      val subF = time("frames expand") {
        val s = graft.operators.SubgraphExpansion.expandFrames(seeds, emptyRel, er, degree = 2)
        s.history.foreach(h => System.err.println(
          s"[p4]   frames degree ${h.degree}: entities=${h.entityCount} relations=${h.relationCount}"))
        s
      }
      time("frames final count")(subF.entityIds.count())
      val subX = time("graphx expand") {
        graft.operators.GraphXExpansion.expand(seeds, emptyRel, er, degree = 2)
      }
      time("graphx final count")(subX.entityIds.count())
    }
    spark.stop()
  }
}
