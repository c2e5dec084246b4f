package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-corpus curation (scale-pipeline family):
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * Catalyst expressions — they run inside whole-stage codegen over any corpus
  * size, no UDFs, no dictionaries shipped per-row.
  *
  * Every function has a `*T` variant taking a pre-projected token-array column.
  * Use those when combining several analyses: passing `Norm.normTokens(text)`
  * inline would re-evaluate the regexp+split once per reference (Catalyst inlines
  * lambda-captured expressions), while a projected column is a per-row read.
  */
object TextAnalysis {

  /** Whitespace token count of normalized text (0 for empty/blank). */
  def tokenCount(text: Column): Column = tokenCountT(Norm.normTokens(text))
  def tokenCountT(toks: Column): Column = size(toks)

  /** Approximate BPE-ish subword count: one token per word + one extra per 4
    * chars of long words (a cheap, deterministic proxy for tokenizer budget). */
  def subwordCount(text: Column): Column = subwordCountT(Norm.normTokens(text))
  def subwordCountT(toks: Column): Column =
    coalesce(aggregate(toks, lit(0),
      (acc, t) => acc + greatest(lit(1), ceil(length(t) / 4.0).cast("int"))), lit(0))

  /** Ratio of non-[a-z0-9 ] characters in the lowercased text (punctuation /
    * symbol density); 0 for empty text. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(lower(text), "[^a-z0-9 ]", ""))).cast("double")
        / length(text))

  /** Mean token length (0 for empty). */
  def avgWordLen(text: Column): Column = avgWordLenT(Norm.normTokens(text))
  def avgWordLenT(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / size(toks))

  private val stopwordsEn = Seq("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")

  /** Fraction of tokens that are (English) stopwords — a standard fluency signal. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = stopwordsEn): Column =
    stopwordRatioT(Norm.normTokens(text), stopwords)
  def stopwordRatioT(toks: Column, stopwords: Seq[String] = stopwordsEn): Column = {
    val sw = typedLit(stopwords)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length signal × (1 − punct density) ×
    * stopword-fluency signal. Deterministic, monotone in each component —
    * the shape of a C4/Gopher-style quality rule, not a learned model. */
  def qualityScore(text: Column): Column = qualityScoreT(text, Norm.normTokens(text))
  def qualityScoreT(text: Column, toks: Column): Column = {
    val lenSignal = least(tokenCountT(toks).cast("double") / 50.0, lit(1.0))
    val punctSignal = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val fluency = least(stopwordRatioT(toks) * 5.0, lit(1.0))
    round(lenSignal * punctSignal * (lit(0.5) + fluency / 2), 6)
  }

  /** Heuristic n-gram language ID over a fixed marker table: scores each language
    * by marker-token hits, returns the argmax (ties broken alphabetically), or
    * "und" when nothing matches. Marker lists are tiny and inlined into the plan. */
  def langId(text: Column): Column = langIdT(Norm.normTokens(text))
  def langIdT(toks: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is", "was", "with"),
      "es" -> Seq("el", "la", "de", "que", "los", "las"),
      "fr" -> Seq("le", "la", "les", "des", "est", "une"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht"))
    val scored = markers.map { case (lang, ms) =>
      struct(size(filter(toks, t => array_contains(typedLit(ms), t))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score desc, lang asc): sort ascending on (-score, lang), take head
    val best = array_sort(array(scored.map(s =>
      struct((-s.getField("score")).as("neg"), s.getField("lang").as("lang"))): _*))(0)
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  // RE2-safe patterns (no backrefs/lookaround) so the DuckDB oracle's regex
  // engine and Java's agree on every match.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\+\\d[\\d .()-]{6,}\\d"

  /** PII redaction for training corpora: emails, IPv4 addresses, and
    * international-format phone numbers → typed placeholder tokens. A chain of
    * codegen'd regexp_replace — one streaming pass per pattern, no UDF. Order
    * matters: emails first (they contain dots/digits), then IPs, then phones. */
  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")

  /** Count of PII matches per kind (regexp_count is codegen'd). */
  def piiEmailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def piiIpCount(text: Column): Column = regexp_count(text, lit(ipRe))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Gopher-style repetition signal: fraction of duplicate word bigrams
    * (0 when fewer than 2 tokens). Pure array expressions over a pre-projected
    * token column — linear in document length. */
  def bigramDupRatioT(toks: Column): Column =
    when(size(toks) < 2, 0.0).otherwise {
      val bigrams = transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
      (size(bigrams) - size(array_distinct(bigrams))).cast("double") / size(bigrams)
    }

  /** Most-frequent-token share of the document (0 for empty). Quadratic in
    * distinct×total tokens per ROW — right for chunk-sized passages; for giant
    * documents use the relational twin (explode → groupBy → max/count). */
  def maxTokenFreqRatioT(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      array_max(transform(array_distinct(toks), d => size(filter(toks, t => t === d))))
        .cast("double") / size(toks))

  /** Document fingerprint: md5 of the sorted distinct normalized token set —
    * collapses word-order and repetition variants (fingerprint dedup). */
  def fingerprint(text: Column): Column = fingerprintT(Norm.normTokens(text))
  def fingerprintT(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  // ------------------------------------------------------- Gopher rule gate
  // Rule-based document quality gate in the shape of Gopher's (Rae et al.
  // 2021, §A1.1) pre-filter — the heuristics a curation pass applies to the
  // RAW text (whitespace words, line shape) before any model-based scoring.
  // All pure built-ins: one codegen'd projection per signal, no shuffle, no
  // dictionaries. Callers should project `rawWords`/`rawLines` as their own
  // (evalOnce'd) columns and feed the `*W`/`*L` signals, since each signal
  // re-references the array.

  /** Whitespace-split words of the RAW text (normalization would erase the
    * punctuation/casing signals the rules inspect); empties dropped. */
  def rawWords(text: Column): Column = filter(split(text, "\\s+"), w => w =!= "")

  /** Lines of the raw text (always ≥ 1 — split never returns empty). */
  def rawLines(text: Column): Column = split(text, "\n")

  /** Mean word length; null for word-less documents (so threshold
    * comparisons fail closed rather than comparing against a fake 0). */
  def meanWordLenW(words: Column): Column =
    when(size(words) === 0, lit(null).cast("double"))
      .otherwise(aggregate(words, lit(0), (a, w) => a + length(w)).cast("double") / size(words))

  /** Fraction of words containing at least one alphabetic character
    * (Gopher's "80% of words must contain an alphabetic character").
    * Both cases: these are RAW words by design, so an all-caps document
    * must count as alphabetic (r8 review). */
  def alphaWordFracW(words: Column): Column =
    when(size(words) === 0, lit(null).cast("double"))
      .otherwise(size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / size(words))

  /** Number of DISTINCT required stopwords present (Gopher: ≥ 2 of a fixed
    * small set — a cheap "is this prose" signal). */
  def stopKindCountW(words: Column, stops: Seq[String] = stopwordsEn): Column =
    size(array_intersect(array_distinct(words), typedLit(stops))).cast("long")

  /** Fraction of lines starting with a bullet ("- " / "* "). */
  def bulletLineFracL(lines: Column): Column =
    size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
      .cast("double") / size(lines)

  /** Fraction of lines ending in an ellipsis. */
  def ellipsisLineFracL(lines: Column): Column =
    size(filter(lines, l => l.endsWith("..."))).cast("double") / size(lines)

  /** Winnowing-style rolling-hash fingerprint: minimum md5 over character
    * k-grams of the normalized text (null if shorter than k). Pass a
    * pre-projected normalized-text column for the same inlining reason. */
  // ------------------------------------------------ markup content extraction
  // The in-scope core of the reference's S2/S3 converters (MarkItDown /
  // trafilatura, loaders/converter.py + url_fetcher.py): once bytes are
  // text, extraction is regex/string work that runs inside codegen over any
  // corpus — strip script/style blocks, strip tags, unescape the five XML
  // entities, collapse whitespace. RE2-safe patterns (lazy quantifiers, no
  // backrefs) so a DuckDB twin evaluates them identically.

  /** Visible text of a markup document: script/style blocks and tags → space,
    * entities unescaped (&amp; LAST so "&amp;lt;" cannot double-unescape),
    * whitespace collapsed, trimmed. */
  def stripMarkup(html: Column): Column = {
    val noBlock = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTag = regexp_replace(noBlock, "<[^>]*>", " ")
    val unesc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTag,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(unesc, "\\s+", " "))
  }

  /** Total character length of anchor (`<a …>…</a>`) inner content — the
    * numerator of link density, the classic boilerplate signal (nav bars and
    * footers are link-dense, body prose is not). Assumes tag-free anchor
    * content (strip nested markup upstream when that does not hold). */
  def linkTextLen(html: Column): Column =
    coalesce(aggregate(
      regexp_extract_all(html, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(x)), lit(0))

  def minKgramHash(text: Column, k: Int = 8): Column = minKgramHashNorm(Norm.normPhrase(text), k)
  def minKgramHashNorm(norm: Column, k: Int): Column =
    when(length(norm) < k, lit(null).cast("string")).otherwise(
      array_min(transform(
        sequence(lit(1), length(norm) - k + 1),
        i => md5(norm.substr(i, lit(k))))))

  /** Sentence count under EXACTLY the
    * [[graft.operators.Chunker.splitSentences]] segmentation rule, without
    * materializing the sentence rows: the same marker split (captured
    * terminator re-emitted with \u0001, no lookbehind), non-empty fragments
    * counted in place — one projection, no explode, and by construction
    * equal to the t6 row count per document. */
  def sentenceCount(text: Column): Column =
    size(filter(split(regexp_replace(text, "([.!?])\\s+", "$1\u0001"), "\u0001"),
      x => length(trim(x)) > 0))

  /** Syllable-group count: maximal [aeiouy]+ runs over the normalized text —
    * the standard cheap syllable surrogate (each vowel cluster ≈ one
    * syllable). Spaces break runs, so the doc-level count equals the
    * per-word sum without a token explode. */
  def syllableCountNorm(norm: Column): Column =
    regexp_count(norm, lit("[aeiouy]+"))

  /** Flesch Reading Ease over the engine's own normalization/segmentation
    * surrogates: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Word-less or sentence-less documents yield NULL (fail closed — a
    * formula fed degenerate denominators must not claim a readability).
    * All three inputs are exact integer counts, so the score is the same
    * IEEE double on any engine. */
  def fleschReadingEase(nSents: Column, nWords: Column, nSylls: Column): Column =
    when(nWords > 0 && nSents > 0,
      lit(206.835) - lit(1.015) * (nWords.cast("double") / nSents)
        - lit(84.6) * (nSylls.cast("double") / nWords))
}
