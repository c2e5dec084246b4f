package graft

// Per-STAGE task-time census for one bench query — the skew/straggler read
// (guide §2.5/§2.6): for every stage of the query's jobs, print task count,
// sum/median/max task time, and the max/median spread. A spread >> ~4x on a
// data-carrying stage names a skewed key; a spread ~1 with poor core
// scaling names fixed per-task or serial cost instead.
// Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfileStages <query> [runs]
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

object ProfileStages {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("fi1_frequent_pairs")
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

    val taskMs = TrieMap.empty[Int, Vector[Long]] // stageId -> task durations
    val shuffleRead = TrieMap.empty[Int, Long]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        taskMs.updateWith(te.stageId) {
          case Some(v) => Some(v :+ te.taskInfo.duration)
          case None => Some(Vector(te.taskInfo.duration))
        }
        if (te.taskMetrics != null)
          shuffleRead.updateWith(te.stageId) {
            case Some(b) => Some(b + te.taskMetrics.shuffleReadMetrics.totalBytesRead)
            case None => Some(te.taskMetrics.shuffleReadMetrics.totalBytesRead)
          }
        ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val id = sc.stageInfo.stageId
        val ds = taskMs.getOrElse(id, Vector.empty).sorted
        if (ds.nonEmpty) {
          val med = math.max(ds(ds.size / 2), 1L)
          val rd = shuffleRead.getOrElse(id, 0L) / (1 << 20)
          done.add(id -> (f"[stage] id=$id%-4d tasks=${ds.size}%-4d " +
            f"sum=${ds.sum / 1000.0}%7.2fs med=${med / 1000.0}%6.2fs " +
            f"max=${ds.max / 1000.0}%6.2fs spread=${ds.max.toDouble / med}%5.1fx " +
            f"shufRead=${rd}MB  ${sc.stageInfo.name.take(60)}"))
        }
        ()
      }
    }
    val fn = SparkEntry.queries(name)
    for (r <- 1 to runs) {
      taskMs.clear(); shuffleRead.clear(); done.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq.sortBy(_._1).foreach(l => println(l._2))
      println(f"[stage-census] $name run=$r rows=$n stages=${done.size} wall=$sec%.2fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
