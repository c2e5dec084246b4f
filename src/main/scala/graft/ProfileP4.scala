package graft

// Stage-level profiler for the p4_degree2 bench query: edge-pair
// materialization vs the per-hop expansion jobs. Findings baked into the
// bench query (SparkEntry "p4_degree2"):
//  - materialize the edge frame once (localCheckpoint) — every hop action
//    would otherwise rescan the source;
//  - do NOT pre-distinct it: each hop re-distincts its own bounded output,
//    so the global dedup shuffle costs ~2 s and buys nothing;
//  - first run pays plan codegen (~+2 s); warm runs are the steady state.
import graft.operators.SubgraphExpansion
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object ProfileP4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/lineitem.parquet").count() // fs warm-up

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p4] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val er = t("er pairs + localCheckpoint") {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey").cast("string").as("entity_id"),
          col("l_orderkey").cast("string").as("relation_id"))
        .localCheckpoint(true)
    }
    val seeds = er.filter(col("entity_id").cast("long") % 211 === 0)
      .select("entity_id").distinct()
    import spark.implicits._
    val noRels = Seq.empty[String].toDF("relation_id")
    var sub: graft.operators.Subgraph = null
    for (i <- 1 to 3)
      sub = t(s"expand degree=2 (run $i)") {
        SubgraphExpansion.expand(seeds, noRels, er, degree = 2)
      }
    t("count result") { println("[p4] entities=" + sub.entityIds.count()) }
    sub.history.foreach(h => println(
      s"[p4] degree=${h.degree} +e=${h.addedEntityIds.size} +r=${h.addedRelationIds.size}"))
    spark.stop()
  }
}
