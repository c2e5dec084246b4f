package graft.rag

/** V2 rerank formatting/parsing machinery (llm/reranker.py:141-296), minus the LLM.
  *
  * The reference formats candidates as `"[id] text"` lines, asks the model for the
  * useful ones in the same format, then parses `[id]` back out, validates each id
  * against the candidate set, and applies a text-match correction when the model
  * hallucinated or mangled an id (`_correct_line`, reranker.py:81-92). There is NO
  * fallback fill: fewer than `numSelect` valid lines ⇒ fewer results.
  *
  * These are pure functions so any Reranker impl (LLM-backed or deterministic)
  * shares identical parse/validate semantics — and they are unit-testable without
  * a model.
  */
object RerankFormat {

  /** `"[id] text"` candidate block, one line each (reranker.py:148-149). */
  def formatCandidates(candidates: Seq[(String, String)]): String =
    candidates.map { case (id, text) => s"[$id] $text" }.mkString("\n")

  private val LinePattern = """\s*\[([^\]\n]+)\]\s*(.*)""".r

  /** Parse a response of `[id] text` lines into ordered (id, text) pairs;
    * non-conforming lines are dropped. Parsing stops at the first blank line —
    * the reference passes stop=['\n\n'] to the model (reranker.py:203). */
  def parseSelection(response: String): Seq[(String, String)] = {
    val upToBlank = response.split("\n\n", 2).head
    upToBlank.linesIterator.collect {
      case LinePattern(id, text) => (id.trim, text.trim)
    }.toSeq
  }

  /** Validate parsed ids against the candidate set; a line whose id is unknown is
    * recovered by exact text match against candidate texts (first match wins),
    * else dropped. Order preserved; duplicates collapse to first occurrence;
    * result capped at `numSelect`. */
  def validateSelection(
      parsed: Seq[(String, String)],
      candidates: Seq[(String, String)],
      numSelect: Int): Seq[String] = {
    val idSet = candidates.map(_._1).toSet
    val byText = candidates.groupBy(_._2).view.mapValues(_.head._1).toMap
    val resolved = parsed.flatMap {
      case (id, _) if idSet.contains(id) => Some(id)
      case (_, text) => byText.get(text)
    }
    resolved.distinct.take(numSelect)
  }
}

/** A Reranker that consumes a pluggable "response generator" through the full
  * format→respond→parse→validate loop — the deterministic default scores by
  * similarity, mirroring exactly what an LLM impl would plug into. */
final case class ParsingReranker(
    respond: (String, String) => String = ParsingReranker.scoreResponder)
    extends Reranker {
  override def rerank(candidates: Seq[(String, String, Double)], question: String,
      numSelect: Int): Seq[String] = {
    val cand = candidates.map(c => (c._1, c._2))
    val prompt = RerankFormat.formatCandidates(cand)
    val response = respond(question, prompt)
    RerankFormat.validateSelection(RerankFormat.parseSelection(response), cand, numSelect)
  }
}

object ParsingReranker {
  /** Deterministic stand-in for the LLM: re-emit candidate lines ordered by
    * normalized token overlap with the question (stable on ties) — the same
    * information a reranking model sees, judged lexically. */
  val scoreResponder: (String, String) => String = (question, formatted) => {
    val qToks = TextNorm.normalize(question).split(" ").filter(_.nonEmpty).toSet
    RerankFormat.parseSelection(formatted)
      .sortBy { case (_, text) =>
        -TextNorm.normalize(text).split(" ").count(qToks.contains)
      }
      .map { case (id, text) => s"[$id] $text" }
      .mkString("\n")
  }
}
