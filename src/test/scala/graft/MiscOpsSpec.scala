package graft

import graft.functions.{InstructionTemplate, Norm}
import graft.model.Triplet
import graft.operators.Assembly
import graft.rag.WindowTripletExtractor
import graft.sources.Loaders
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MiscOpsSpec extends SparkSpec {
  import spark.implicits._

  test("V5 backfill appends naive hits not already present, preserving order") {
    val graphHits = Seq(("pA", 1), ("pB", 2)).toDF("passage_id", "rank")
    val naive = Seq(("pB", 1), ("pC", 2), ("pD", 3)).toDF("passage_id", "rank")
    val got = Assembly.backfill(graphHits, naive, topK = 3)
      .orderBy("rank").select("passage_id").as[String].collect().toSeq
    assert(got == Seq("pA", "pB", "pC"))
  }

  test("X1 deterministic extractor: consecutive normalized token triples") {
    val ex = WindowTripletExtractor()
    assert(ex.extract("Einstein developed General Relativity early on") ==
      Seq(Triplet("einstein", "developed", "general"), Triplet("relativity", "early", "on")))
    assert(ex.extract("one two").isEmpty)
    assert(ex.extract("").isEmpty)
  }

  test("S1 file source: one document per file with source metadata") {
    val dir = Files.createTempDirectory("textdocs")
    Files.writeString(dir.resolve("a.txt"), "first doc\nwith two lines")
    Files.writeString(dir.resolve("b.md"), "second doc")
    val docs = Loaders.readTextDocuments(spark, dir.toString + "/*")
    val byName = docs.collect().map(r => r.getAs[String]("file_name") -> r).toMap
    assert(byName.keySet == Set("a.txt", "b.md"))
    assert(byName("a.txt").getAs[String]("text") == "first doc\nwith two lines")
    assert(byName("a.txt").getAs[String]("source_type") == "txt")
    assert(byName("b.md").getAs[String]("source").endsWith("b.md"))
  }

  test("T4 passage composition and E2 instruction templating") {
    val got = Seq(("Title", "Body text")).toDF("title", "text")
      .select(Norm.composePassage($"title", $"text")).as[String].head()
    assert(got == "Title\nBody text")
    val q = Seq("find this").toDF("t")
      .select(InstructionTemplate.forQuery($"t")).as[String].head()
    assert(q == "Represent this sentence for searching relevant passages: find this")
  }
}
