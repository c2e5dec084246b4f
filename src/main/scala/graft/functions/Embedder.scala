package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E1/E3/E4 embedding operators (SURVEY §2.5).
  *
  * The reference calls OpenAI/HuggingFace (storage/embeddings.py:289-323) and its own
  * tests mock the model with deterministic vectors (tests/conftest.py:36-43). We keep
  * the same boundary: an [[Embedder]] produces a vector Column from a text Column, and
  * the default implementation is a pure, seeded feature-hash — fully distributed,
  * expression-only (no UDF), reproducible across runs and engines (FIXTURES.md §6).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Array[Double] column of length `dim`, L2-normalized; empty/whitespace text ⇒
    * zero vector (embeddings.py:180-203). */
  def embed(text: Column): Column
}

/** Deterministic hash embedder: tokens → signed feature-hash buckets → L2 normalize.
  *
  * bucket(t) = int(md5(seed‖t)[0:8], 16) % dim ; sign(t) = ±1 from the next md5 hex
  * digit. Composed entirely of codegen'd built-ins so it runs inside whole-stage
  * codegen at any scale. Cost O(dim × n_tokens) per row — fine for the spec/test
  * path; a real model plugs in behind the same trait.
  */
final case class HashEmbedder(dim: Int = 64, seed: String = "graft42") extends Embedder {

  private def bucket(t: Column): Column =
    conv(substring(md5(concat(lit(seed), t)), 1, 8), 16, 10).cast("long") % dim

  private def sign(t: Column): Column =
    when(conv(substring(md5(concat(lit(seed), t)), 9, 1), 16, 10).cast("int") >= 8, -1.0d)
      .otherwise(1.0d)

  override def embed(text: Column): Column = {
    val toks = Norm.normTokens(text)
    val raw = transform(
      sequence(lit(0), lit(dim - 1)),
      j => aggregate(toks, lit(0.0d),
        (acc, t) => acc + when(bucket(t) === j.cast("long"), sign(t)).otherwise(0.0d)))
    VectorFunctions.l2Normalize(raw)
  }
}

/** E2 instruction templating (embeddings.py:17-30): query-vs-document prefixing. */
object InstructionTemplate {
  def forQuery(text: Column, instruction: String = "Represent this sentence for searching relevant passages"): Column =
    concat(lit(instruction), lit(": "), text)
  def forDocument(text: Column): Column = text
}
