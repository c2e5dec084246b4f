package graft.rag

import graft.model.Triplet

/** The nondeterministic boundaries of the reference pipeline, each behind a trait
  * with a deterministic default (SURVEY §7.1). The reference itself never exercises
  * the live LLM in tests: embeddings are mocked (tests/conftest.py:36-43), triplets
  * come pre-extracted (evaluation/evaluate.py:389-394), NER has a TSV cache
  * (llm/extractor.py:296-314). Our defaults mirror exactly those offline paths.
  */

/** X1: document text → triplets (llm/extractor.py:135-233). */
trait TripletExtractor extends Serializable {
  def extract(text: String): Seq[Triplet]
}

/** Deterministic extractor for tests: consecutive normalized token triples.
  * Stands in for the LLM exactly as pre-extracted triplets do in the reference eval. */
final case class WindowTripletExtractor(maxTriplets: Int = 8) extends TripletExtractor {
  override def extract(text: String): Seq[Triplet] = {
    val toks = TextNorm.normalize(text).split(" ").filter(_.nonEmpty)
    toks.sliding(3, 3).collect {
      case Array(s, p, o) => Triplet(s, p, o)
    }.take(maxTriplets).toSeq
  }
}

/** X2: question → named entities (llm/extractor.py:320-375, TSV-cache-first). */
trait NerExtractor extends Serializable {
  def entities(question: String): Seq[String]
}

/** Cache-backed NER: exact-match question lookup, entities normalized (T2);
  * missing question → all normalized tokens (a safe deterministic fallback). */
final case class CachedNerExtractor(cache: Map[String, Seq[String]]) extends NerExtractor {
  override def entities(question: String): Seq[String] =
    cache.get(question) match {
      case Some(es) => es.map(TextNorm.normalize).filter(_.nonEmpty).distinct
      case None => TextNorm.normalize(question).split(" ").filter(_.nonEmpty).distinct.toSeq
    }
}

/** V2: ordered selection of ≤`numSelect` relations (llm/reranker.py:141-296;
  * numSelect hardcoded 5 at :276). */
trait Reranker extends Serializable {
  def rerank(candidates: Seq[(String, String, Double)], question: String, numSelect: Int = 5): Seq[String]
}

/** Deterministic rerank double: top-n by (score desc, id asc) — the degenerate
  * impl licensed by SURVEY §2.8 V2 for oracle tests. */
object ScoreReranker extends Reranker {
  override def rerank(candidates: Seq[(String, String, Double)], question: String, numSelect: Int): Seq[String] =
    candidates.sortBy { case (id, _, score) => (-score, id) }.take(numSelect).map(_._1)
}

/** V6: passages → answer (llm/reranker.py:299-384). */
trait AnswerGenerator extends Serializable {
  def answer(question: String, passages: Seq[String]): String
}

/** Deterministic template answerer (echo impl licensed by SURVEY §2.8 V6). */
object TemplateAnswerGenerator extends AnswerGenerator {
  override def answer(question: String, passages: Seq[String]): String =
    s"[$question] -> ${passages.take(1).map(_.linesIterator.next()).mkString}"
}

/** Scala-side copy of T2 normalization for driver-side strings (must agree with
  * [[graft.functions.Norm.normPhrase]]). */
object TextNorm {
  def normalize(s: String): String =
    s.toLowerCase.map(c =>
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') c else ' ').trim
}
