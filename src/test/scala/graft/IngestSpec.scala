package graft

import graft.rag.{CachedNerExtractor, GraphRag, ParsingReranker, RagConfig}
import graft.sources.{GraphStore, Ingest}
import java.nio.file.Files

class IngestSpec extends SparkSpec {

  test("DataFrame-native import: scan -> chunk -> extract -> build, no Seq[Doc]") {
    val dir = Files.createTempDirectory("ingestdf")
    Files.writeString(dir.resolve("einstein.txt"),
      "Albert Einstein published the theory of relativity. " +
        ("He worked at the patent office in Bern for many years. " * 20))
    Files.writeString(dir.resolve("curie.txt"),
      "Marie Curie discovered radium and polonium in Paris.")
    val docsDf = Ingest.importTextDf(spark, dir.toString + "/*.txt", chunkSize = 300, overlap = 50)
    assert(docsDf.columns.toSeq == Seq("id", "text"))
    val nChunks = docsDf.count()
    assert(nChunks > 2)

    val store = new GraphStore(spark, Files.createTempDirectory("ingestdfstore").toString)
    val rag = new GraphRag(spark, store, "ingestdf",
      config = RagConfig(entitySimilarityThreshold = 0.3, finalTopK = 3),
      ner = CachedNerExtractor(Map.empty))
    val stats = rag.addDocumentsDf(docsDf)
    assert(stats("passages") == nChunks)

    val r = rag.retrieve("marie curie discovered radium")
    assert(r.passages.map(_.id).contains("curie.txt#0"), s"got ${r.passages.map(_.id)}")

    // the Seq facade and the DataFrame path agree on the chunk set
    val seqIds = Ingest.importText(spark, dir.toString + "/*.txt", 300, 50).map(_.id).toSet
    assert(seqIds == docsDf.select("id").collect().map(_.getString(0)).toSet)
  }

  test("/import path: files -> chunks -> indexable docs -> retrievable graph") {
    val dir = Files.createTempDirectory("ingest")
    Files.writeString(dir.resolve("einstein.txt"),
      "Albert Einstein published the theory of relativity. " +
        ("He worked at the patent office in Bern for many years. " * 20))
    Files.writeString(dir.resolve("curie.txt"),
      "Marie Curie discovered radium and polonium in Paris.")
    val docs = Ingest.importText(spark, dir.toString + "/*.txt", chunkSize = 300, overlap = 50)
    assert(docs.size > 2) // einstein.txt got chunked, curie.txt is one chunk
    assert(docs.exists(_.id == "curie.txt#0"))
    assert(docs.exists(_.id.startsWith("einstein.txt#")))
    assert(docs.forall(_.text.length <= 300))

    // index through the full engine (window extractor supplies triplets) and
    // retrieve with the format/parse/validate reranker in the loop
    val store = new GraphStore(spark, Files.createTempDirectory("ingeststore").toString)
    val rag = new GraphRag(spark, store, "ingest",
      config = RagConfig(entitySimilarityThreshold = 0.3, finalTopK = 3),
      ner = CachedNerExtractor(Map.empty),
      reranker = ParsingReranker())
    val stats = rag.addDocuments(docs)
    assert(stats("passages") == docs.size.toLong)
    val r = rag.retrieve("marie curie discovered radium")
    assert(r.passages.nonEmpty)
    assert(r.passages.map(_.id).contains("curie.txt#0"), s"got ${r.passages.map(_.id)}")
  }
}
