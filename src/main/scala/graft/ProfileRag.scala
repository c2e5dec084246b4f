package graft

// Stage-level profiler for the rag_pipeline bench query. MIRRORS the stage
// wiring of SparkEntry's "rag_pipeline" — keep the two in sync when editing
// either (the bench query is the source of truth).
import graft.functions.HashEmbedder
import graft.functions.Norm
import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

object ProfileRag {
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

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val s = spark
    val toksC = Norm.normTokens(col("text"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .filter(col("n_chars") > 0)
      .select(col("doc_id").cast("string").as("id"), col("text"), toksC.as("toks"))
      .select(col("id"), col("text"),
        when(size(col("toks")) < 3, array().cast("array<struct<subject:string,predicate:string,obj:string>>"))
          .otherwise(transform(
            sequence(lit(1), size(col("toks")) - 2, lit(3)),
            i => struct(
              element_at(col("toks"), i).as("subject"),
              element_at(col("toks"), i + 1).as("predicate"),
              element_at(col("toks"), i + 2).as("obj"))))
          .as("triplets"))
    val docsCp = t("cp docs (triplet arrays)") { docs.localCheckpoint(true) }
    val gt0 = t("GraphBuilder.build (triplet cp)") {
      GraphBuilder.build(docsCp, HashEmbedder(dim = 32))
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val Seq(ents, rels, er) = t("cp 3 tables (parallel)") {
      Await.result(Future.sequence(Seq(
        Future(gt0.entities.localCheckpoint(true)),
        Future(gt0.relations.localCheckpoint(true)),
        Future(gt0.entityRelation.localCheckpoint(true)))), Duration.Inf)
    }
    val gt = gt0.copy(entities = ents, relations = rels, entityRelation = er)

    val question = "the spark join order for big table scan"
    val seedNames = s.createDataFrame(
      question.split(" ").map(Tuple1(_)).toSeq).toDF("qtext")
      .select(col("qtext"), HashEmbedder(dim = 32).embed(col("qtext")).as("qvec"))
    val entityHits = t("entity KNN (lazy)") {
      VectorSearch.dedupUnion(VectorSearch.thresholdFilter(
        VectorSearch.knnJoin(seedNames, gt.entities, "qtext", "qvec", "id", "embedding", 5),
        0.5))
        .select(col("neighbor_id").as("entity_id"))
    }
    val sub = t("expansion (collects)") {
      SubgraphExpansion.expand(
        entityHits,
        s.emptyDataFrame.withColumn("relation_id", lit("")).filter(lit(false)),
        gt.entityRelation, degree = 1)
    }
    val qvecDf = s.createDataFrame(Seq(Tuple1(question))).toDF("qtext")
      .select(col("qtext"), HashEmbedder(dim = 32).embed(col("qtext")).as("qvec"))
    val relHits = VectorSearch.knnJoin(
      qvecDf,
      gt.relations.join(
        broadcast(sub.relationIds.withColumnRenamed("relation_id", "id")),
        Seq("id"), "left_semi"),
      "qtext", "qvec", "id", "embedding", 5)
      .select(col("neighbor_id").as("relation_id"), col("rank").as("rel_rank"))
    val out = t("rel KNN + assembly count") {
      Assembly.passagesForRelations(relHits, gt.relations, topK = 10).count()
    }
    println(s"[prof] rows=$out")
    spark.stop()
  }
}
