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
    val toksC = Norm.evalOnce(Norm.normTokens(col("text")))
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
    // r7 wiring: docs is LAZY (EvalBarrier pins the tokenize, no checkpoint);
    // the builder's triplet checkpoint is the one corpus-scale job.
    val gt0 = t("GraphBuilder.build (triplet cp)") {
      GraphBuilder.build(docs, HashEmbedder(dim = 32))
    }

    val question = "the spark join order for big table scan"
    val seedNames = s.createDataFrame(
      question.split(" ").map(Tuple1(_)).toSeq).toDF("qtext")
      .select(col("qtext"), HashEmbedder(dim = 32).embed(col("qtext")).as("qvec"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val (gt, entityHits) = t("cp relations || seed KNN") {
      val relF = Future(gt0.relations.localCheckpoint(true))
      val hitsF = Future(
        VectorSearch.dedupUnion(VectorSearch.thresholdFilter(
          VectorSearch.knnJoin(seedNames, gt0.entities, "qtext", "qvec", "id", "embedding", 5),
          0.5))
          .select(col("neighbor_id").as("entity_id"))
          .localCheckpoint(true))
      val rels = Await.result(relF, Duration.Inf)
      val er = rels.select(col("id").as("relation_id"), explode(col("decomp_pairs")).as("p"))
        .select(explode(array(
          struct(col("p.subject_id").as("entity_id"), col("relation_id"), lit("subject").as("role")),
          struct(col("p.object_id").as("entity_id"), col("relation_id"), lit("object").as("role")))).as("e"))
        .select(col("e.entity_id"), col("e.relation_id"), col("e.role"))
      (gt0.copy(relations = rels, entityRelation = er), Await.result(hitsF, Duration.Inf))
    }
    val sub = t("expansion (1 fused collect)") {
      SubgraphExpansion.expand(
        entityHits,
        s.emptyDataFrame.withColumn("relation_id", lit("")).filter(lit(false)),
        gt.entityRelation, degree = 1,
        fuseSeedInit = true)
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

    // ---- store-backed single-question retrieve (the serving path) ----------
    import graft.rag.{GraphRag, RagConfig}
    import graft.sources.GraphStore
    val store = new GraphStore(spark,
      java.nio.file.Files.createTempDirectory("profragstore").toString)
    val rag = new GraphRag(spark, store, "prof",
      config = RagConfig(entityTopK = 5, relationTopK = 5,
        entitySimilarityThreshold = 0.5, finalTopK = 10),
      embedder = HashEmbedder(dim = 32))
    t("store.save (parquet barrier)") {
      store.save("prof", gt)
    }
    for (i <- 1 to 3)
      t(s"retrieve (run $i)") { rag.retrieve(question).passages.size }

    // Stage split of one warm retrieve (mirrors GraphRag.retrieve wiring).
    {
      val entitiesT = store.cachedTable("prof", "entities")
      val relationsT = store.cachedTable("prof", "relations")
      val passagesT = store.cachedTable("prof", "passages")
      val erT = store.cachedTable("prof", "entity_relation")
      val emb = HashEmbedder(dim = 32)
      import spark.implicits._
      val qents = question.split(" ").toSeq
      val qdf = qents.toDF("qtext")
        .select(col("qtext"), emb.embed(col("qtext")).as("qvec"))
      val entitySeeds = t("r: entity KNN (lazy)") {
        VectorSearch.dedupUnion(VectorSearch.thresholdFilter(
          VectorSearch.knnJoin(qdf, entitiesT, "qtext", "qvec", "id", "embedding", 5), 0.5))
          .select(col("neighbor_id").as("entity_id"))
      }
      val qvecDf = Seq(question).toDF("qtext")
        .select(col("qtext"), emb.embed(col("qtext")).as("qvec"))
      val relationSeeds = VectorSearch.thresholdFilter(
        VectorSearch.knnJoin(qvecDf, relationsT, "qtext", "qvec", "id", "embedding", 5), -1.0)
        .select(col("neighbor_id").as("relation_id"))
      val sub = t("r: expansion (fused)") {
        SubgraphExpansion.expand(entitySeeds, relationSeeds, erT, 1, fuseSeedInit = true)
      }
      println(s"[prof] r: subgraph relations=" +
        sub.history.map(h => s"${h.degree}:${h.relationCount}").mkString(" "))
      val qvec = emb.embedOne(question).get
      val cands = relationsT
        .join(broadcast(sub.relationIds.withColumnRenamed("relation_id", "id")),
          Seq("id"), "left_semi")
        .select(col("id"), col("text"), col("embedding"))
      val (candRows, _) = t("r: eviction fused") {
        Assembly.evictionTopKRows(cands, qvec, 1000)
      }
      val ranked = candRows.take(5).zipWithIndex
        .map { case (r, i) => (r._1, i + 1) }.toDF("relation_id", "rel_rank")
      t("r: final assembly collect") {
        val graphPassages = Assembly.passagesForRelations(ranked, relationsT, 10)
        val naive = VectorSearch.knnJoin(
          qvecDf, passagesT, "qtext", "qvec", "id", "embedding", 10)
          .select(col("neighbor_id").as("passage_id"), col("rank"))
        passagesT.select(col("id").as("passage_id"), col("text"))
          .join(broadcast(Assembly.backfill(graphPassages, naive, 10)), Seq("passage_id"))
          .orderBy("rank").collect().length
      }
    }
    spark.stop()
  }
}
