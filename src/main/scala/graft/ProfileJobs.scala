package graft

// Job-level census for one bench query: runs the query (twice — cold then
// warm) with a SparkListener recording per-job wall-clock and task counts, so
// "the ~40-job composite" stops being a guess. Usage:
//   SPARK_GRAFT_SF_DIR=... runMain graft.ProfileJobs <queryName> [runs]
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("rag_pipeline")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
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

    val starts = TrieMap.empty[Int, (Long, Int)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(), js.stageInfos.map(_.numTasks).sum)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, nTasks) =>
          lines.add(je.jobId ->
            f"[job] id=${je.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%6.2fs tasks=$nTasks%-4d")
        }
    }
    val fn = SparkEntry.queries(name)
    for (r <- 1 to runs) {
      lines.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // drain BEFORE detaching: JobEnd events dispatch on the async bus
      // thread, so removing the listener first would drop trailing jobs
      // from the census — the exact number this tool exists to pin down
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val sorted = lines.asScala.toSeq.sortBy(_._1)
      sorted.foreach(l => println(l._2))
      println(f"[census] $name run=$r rows=$n jobs=${sorted.size} wall=$sec%.2fs")
      // free this run's checkpoints like Bench does
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
