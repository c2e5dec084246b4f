package graft

// Stage-level census for cs11 (VERDICT r18 #2): where do the seconds go —
// the md5 chain, the duplicated second corpus pass, or fixed cost?
// Times, on the cs11 input projection at $SPARK_GRAFT_SF_DIR:
//   scan+null-filter count (the cheap pass: no md5),
//   leveled noop (ONE md5 pass, every column materialized),
//   histogram pass alone (the level-selection branch),
//   full build survivors count (both passes),
//   full cs11 quantiles.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileCs {
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
    import graft.operators.QuantileSketch

    def li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")).as("lid"))

    def time(name: String)(body: => Unit): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        body
        println(f"[cs-profile] $name run=$r ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("null-filter count (no md5)") {
      li.filter(col("price_cents").isNotNull && col("lid").isNotNull).count()
    }
    time("leveled noop (one md5 pass)") {
      noop(QuantileSketch.leveled(li, "price_cents", "lid"))
    }
    time("tz histogram (level-selection branch)") {
      QuantileSketch.leveled(li, "price_cents", "lid")
        .groupBy("_tz").agg(count(lit(1))).count()
    }
    time("build survivors count (both passes)") {
      QuantileSketch.build(li, "price_cents", "lid", cap = 256).count()
    }
    time("cs11 quantiles end-to-end") {
      QuantileSketch.quantiles(li, "price_cents", "lid", cap = 256).count()
    }
    spark.stop()
  }
}
