package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization scalar functions (SURVEY §2.2), all built from codegen'd
  * Spark built-ins so they fuse into whole-stage codegen — no UDFs.
  *
  * Reference semantics:
  *  - T2 `processing_phrases` — llm/extractor.py:17-28: lowercase, every char
  *    outside [a-z0-9 ] replaced by a single space, ends trimmed. NOT collapsed.
  *  - T3 relation text — graph/builder.py:99-103: `"<s> <p> <o>"` of normalized parts.
  *  - T4 passage composition — evaluation/evaluate.py:397-401: `title + "\n" + text`.
  *  - T5 title extraction — evaluation/evaluate.py:219-229: first line, trimmed.
  */
object Norm {

  /** T2: lowercase, non-[a-z0-9 ] → ' ', trim. */
  def normPhrase(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9 ]", " "))

  /** T3: `concat_ws(" ", norm(s), norm(p), norm(o))`. */
  def relationText(s: Column, p: Column, o: Column): Column =
    concat_ws(" ", normPhrase(s), normPhrase(p), normPhrase(o))

  /** T4: `title \n text`. */
  def composePassage(title: Column, text: Column): Column =
    concat_ws("\n", title, text)

  /** T5: first line before '\n', trimmed. */
  def titleOf(c: Column): Column =
    trim(substring_index(c, "\n", 1))

  /** Deterministic id = md5(text). The reference assigns UUID4 per first-seen
    * normalized text (graph/builder.py:76-85); identity is by normalized text, so a
    * content hash preserves semantics while making builds reproducible (SURVEY §7.1). */
  def idOf(c: Column): Column = md5(c)

  /** Pin `c` to ONE evaluation per row (a projection barrier, not a storage
    * barrier): wraps it in [[org.apache.spark.sql.graft.EvalBarrier]] so
    * CollapseProject can't inline it into multi-referencing consumers.
    *
    * PROJECTION-ONLY. The barrier works by declaring itself nondeterministic,
    * so an evalOnce-wrapped column used directly in a join condition fails
    * CheckAnalysis (AnalysisException, INVALID_NON_DETERMINISTIC_EXPRESSIONS)
    * and as a groupBy key trips Spark's internal nondeterministic-grouping
    * guard (SparkException) — and PullOutNondeterministic can rewrite other
    * uses behind your back.
    * Correct usage: alias the wrapped expression as its OWN projected column
    * first (`.select(evalOnce(e).as("x"))`), then join/group/sort on the
    * plain column downstream — the barrier guards the projection boundary,
    * the downstream reference is an ordinary deterministic attribute.
    * Pinned by EvalBarrierSpec's negative tests. */
  def evalOnce(c: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(org.apache.spark.sql.graft.EvalBarrier(B.expression(c)))
  }

  /** Whitespace tokenization of an (already normalized) phrase; empty tokens and
    * the empty-string singleton dropped. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Normalized word tokens of raw text: T2 then split. */
  def normTokens(c: Column): Column = tokens(normPhrase(c))

  /** Word n-grams (as space-joined strings) over an array of tokens.
    * `shingles(tokens, 3)` → ["a b c", "b c d", ...]; fewer than n tokens → empty. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
}
