package graft.sources

import graft.model.Doc
import graft.operators.Chunker
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's `/import` entry point (api/app.py:423-474 → S1–S3 + T1):
  * files → documents → chunks, ready for `GraphRag.addDocuments`.
  *
  * Chunk ids are `<file_name>#<chunk_index>` so passages stay traceable to their
  * source file (the reference carries source/chunk_index/total_chunks metadata,
  * loaders/chunker.py:38-45).
  */
object Ingest {

  /** DataFrame-native /import: files → chunk rows (id, text), distributed
    * end-to-end (wholetext scan → flatMap chunker, one plan). Feed straight into
    * `GraphRag.addDocumentsDf` — this is the bulk-ingestion path; nothing is
    * materialized on the driver. */
  def importTextDf(spark: SparkSession, pathGlob: String,
      chunkSize: Int = 1000, overlap: Int = 200): org.apache.spark.sql.DataFrame = {
    val files = Loaders.readTextDocuments(spark, pathGlob)
    Chunker.chunkDocuments(files.withColumnRenamed("file_name", "id"),
        "id", "text", chunkSize, overlap)
      .select(concat_ws("#", col("id"), col("chunk_index")).as("id"),
        col("chunk").as("text"))
  }

  /** `Seq[Doc]` facade over [[importTextDf]] for reference API-shape parity
    * (`addDocuments` takes the reference's `Seq[Doc]`). Collects — use
    * [[importTextDf]] for real corpora. */
  def importText(spark: SparkSession, pathGlob: String,
      chunkSize: Int = 1000, overlap: Int = 200): Seq[Doc] =
    importTextDf(spark, pathGlob, chunkSize, overlap)
      .collect()
      .map(r => Doc(r.getString(0), r.getString(1)))
      .toSeq
}
