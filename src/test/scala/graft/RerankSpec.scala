package graft

import graft.rag.{ParsingReranker, RerankFormat, ScoreReranker}
import org.scalatest.funsuite.AnyFunSuite

class RerankSpec extends AnyFunSuite {
  private val candidates = Seq(
    ("id1", "einstein published relativity"),
    ("id2", "curie discovered radium"),
    ("id3", "darwin wrote origin of species"))

  test("format emits [id] text lines") {
    assert(RerankFormat.formatCandidates(candidates.take(2)) ==
      "[id1] einstein published relativity\n[id2] curie discovered radium")
  }

  test("parse extracts ordered pairs, drops junk, stops at blank line") {
    val resp = "[id2] curie discovered radium\nnot a line\n [id1] einstein published relativity\n\n[id3] after stop"
    assert(RerankFormat.parseSelection(resp) ==
      Seq(("id2", "curie discovered radium"), ("id1", "einstein published relativity")))
  }

  test("validate keeps known ids, corrects hallucinated ids by text match, no fill") {
    val parsed = Seq(
      ("id2", "curie discovered radium"),
      ("hallucinated", "darwin wrote origin of species"), // corrected to id3
      ("alsobad", "no such text"),                        // dropped
      ("id2", "dup"))                                     // deduped
    val got = RerankFormat.validateSelection(parsed, candidates, numSelect = 5)
    assert(got == Seq("id2", "id3"))
    // cap respected
    assert(RerankFormat.validateSelection(parsed, candidates, numSelect = 1) == Seq("id2"))
  }

  test("ParsingReranker round-trips through format->parse->validate") {
    val scored = candidates.map { case (id, t) => (id, t, 1.0) }
    val got = ParsingReranker().rerank(scored, "question", numSelect = 2)
    assert(got == Seq("id1", "id2"))
  }

  test("ScoreReranker: top-n by score desc, ties by id asc") {
    val scored = Seq(("b", "t", 1.0), ("a", "t", 1.0), ("c", "t", 2.0))
    assert(ScoreReranker.rerank(scored, "q", 2) == Seq("c", "a"))
  }
}
