package graft.sources

import graft.rag.TextNorm
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input loaders (SURVEY §2.1 S1/S4/S5).
  *
  * S2 (PDF/DOCX binary conversion) and S3 (URL fetching) are driver-side ingestion
  * concerns in the reference (loaders/converter.py, url_fetcher.py) and are out of
  * scope for a zero-egress engine: ingest pre-converted text. The distributed
  * surface — files → documents with metadata — is here.
  */
object Loaders {

  /** S1 file source (loaders/__init__.py:101-143): one document per file with
    * `source` metadata, via Spark's wholetext reader + input_file_name. */
  def readTextDocuments(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(
        input_file_name().as("source"),
        element_at(split(input_file_name(), "/"), -1).as("file_name"),
        element_at(split(input_file_name(), "\\."), -1).as("source_type"),
        col("value").as("text"))

  /** S4 questions/corpus JSON (evaluation/evaluate.py:76-134): array-of-objects
    * files need multiLine. */
  def readJsonCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S4 OpenIE pre-extracted triplets: `docs[]` entries carrying `passage` and
    * `extracted_triples` (FIXTURES.md §3). Emits (passage, triplets) with arity-3
    * filtering exactly like the reference loader (evaluate.py:101-174). */
  def readExtractedTriplets(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("docs")).as("d"))
      .select(
        col("d.title").as("title"),
        col("d.passage").as("passage"),
        filter(col("d.extracted_triples"), t => size(t) >= 3).as("triples"))
  }

  /** Robust JSONL corpus ingestion with corrupt-record ROUTING — the shape a
    * 100 TB crawl feed demands: web-scale JSONL always carries a tail of
    * truncated writes, encoding garbage and schema drift, and both failure
    * modes of the naive read are wrong (FAILFAST kills a day-long ingest on
    * one bad line; DROPMALFORMED silently loses data with no audit trail).
    * PERMISSIVE parsing with a corrupt-record column splits the stream
    * instead: (good rows matching `schemaDdl`, quarantined raw lines) — the
    * bad side is written to a quarantine path for replay/inspection, the
    * good side flows on. One scan, the split is a codegen'd null check.
    *
    * A row is quarantined when it fails to PARSE (malformed JSON); a parsed
    * object merely missing fields keeps nulls — route those with an explicit
    * filter on required columns (schema drift is a policy decision, not a
    * parse error).
    *
    * Both frames share one cached parse (Spark refuses a bare query on only
    * the corrupt-record column, and two scans would double the ingest);
    * long-lived callers `unpersist()` either returned frame after the good
    * side is persisted downstream. */
  def readJsonlRouted(spark: SparkSession, path: String,
      schemaDdl: String): (DataFrame, DataFrame) = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(schemaDdl).add("_corrupt_record", "string")
    // the parsed frame feeds both split sides; caching avoids Spark's
    // corrupt-record-column restriction on re-reads AND a second file scan
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val good = parsed.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
    (good, bad)
  }

  /** S5 NER TSV cache (llm/extractor.py:296-314): HippoRAG format, tab-separated
    * with header; `triples` column holds JSON with `named_entities`. Returns the
    * question → normalized-entities map used by CachedNerExtractor. */
  def readNerCache(spark: SparkSession, path: String): Map[String, Seq[String]] = {
    val raw = spark.read
      .option("sep", "\t").option("header", "true").csv(path)
    val parsed = raw.select(
      col("question"),
      from_json(col("triples"),
        org.apache.spark.sql.types.StructType.fromDDL("named_entities ARRAY<STRING>")).as("t"))
      .select(col("question"), col("t.named_entities").as("entities"))
      .collect()
    parsed.map { r =>
      val q = r.getString(0)
      val es = Option(r.getSeq[String](1)).getOrElse(Seq.empty)
      q -> es.map(TextNorm.normalize).filter(_.nonEmpty).distinct.toSeq
    }.toMap
  }
}
