package graft

import graft.model.{Doc, Triplet}
import graft.rag.{CachedNerExtractor, GraphRag, RagConfig}
import graft.sources.{GraphStore, Loaders}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the eval fixture's retrieval stages (r14). */
object ProfileEval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val res = "src/test/resources/eval"
    val nerCache = Loaders.readNerCache(spark, s"$res/ner_cache.tsv")
    val openie = Loaders.readExtractedTriplets(spark, s"$res/openie_results.json")
    val store = new GraphStore(spark,
      java.nio.file.Files.createTempDirectory("profeval").toString)
    val docs = openie.collect().map { r =>
      Doc(r.getString(0), r.getString(1),
        r.getSeq[scala.collection.Seq[String]](2).map(t => Triplet(t(0), t(1), t(2))).toSeq)
    }.toSeq
    val g = new GraphRag(spark, store, "eval",
      config = RagConfig(entitySimilarityThreshold = 0.55,
        relationSimilarityThreshold = 0.3, expansionDegree = 2, finalTopK = 5),
      embedder = graft.functions.HashEmbedder(dim = 1024, stopwords = graft.eval.Evaluate.evalStopwords),
      ner = CachedNerExtractor(nerCache))
    g.addDocumentsWithTriplets(docs)
    val q = "Who guards the vault that holds the relic skarnite0?"
    val r = g.retrieve(q)
    println("[prof] ner=" + r.namedEntities.mkString("|"))
    println("[prof] relations=" + r.relations.map(h =>
      s"${h.id}:${h.text}:${f"${h.score}%.3f"}").mkString(" ;; "))
    println("[prof] passages=" + r.passages.map(_.id).mkString(", "))
    println("[prof] history=" + r.expansionHistory)
    spark.stop()
  }
}
