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

  /** Read text files matching `pathGlob`, chunk each, return indexable docs.
    * Distributed end-to-end (wholetext scan → flatMap chunker); collected to the
    * driver only because `addDocuments` takes the reference's `Seq[Doc]` shape. */
  def importText(spark: SparkSession, pathGlob: String,
      chunkSize: Int = 1000, overlap: Int = 200): Seq[Doc] = {
    val files = Loaders.readTextDocuments(spark, pathGlob)
    Chunker.chunkDocuments(files.withColumnRenamed("file_name", "id"),
        "id", "text", chunkSize, overlap)
      .select(concat_ws("#", col("id"), col("chunk_index")).as("id"), col("chunk"))
      .collect()
      .map(r => Doc(r.getString(0), r.getString(1)))
      .toSeq
  }
}
