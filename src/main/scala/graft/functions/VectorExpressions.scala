package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, DotProduct}

/** Column-level vector math (SURVEY §2.5 E3, §2.6). Everything stays in Catalyst —
  * either the native codegen'd [[org.apache.spark.sql.graft.DotProduct]] expression
  * or codegen'd higher-order functions; no UDFs in the hot path. */
object VectorFunctions {
  import org.apache.spark.sql.functions._

  /** Native codegen dot product (preferred). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Spec-form dot product via higher-order functions (kept as the readable
    * semantic definition and codegen-fallback cross-check; `dot` is the fast path). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖v‖₂ in double precision (embeddings.py:142-143). */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** v / ‖v‖₂, zero vectors left untouched (embeddings.py:180-203: empty text ⇒
    * zero vector, which must survive normalization without NaNs). */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, transform(v, x => x.cast("double")))
      .otherwise(transform(v, x => x.cast("double") / n))
  }

  /** Cosine similarity; 0 when either side is a zero vector. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** [[cosine]] with both norms PRE-COMPUTED (hoisted per row by the
    * caller): the n² pair-scan form — one dot product per pair instead of
    * three. Same VALUE as `cosine` for the same vectors (the norms are the
    * same sqrt-of-dot), so an oracle written against the plain formula
    * stays bit-equal. ONE definition so the five pair-scan call sites
    * (hard negatives, label agreement, mutual kNN, triplet mining,
    * embedding near-dup) can never drift apart. */
  def cosinePre(a: Column, na: Column, b: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))

  /** Deterministic hyperplane sign sketch: bit j = [v · h_j ≥ 0], h_j a
    * ±1 direction with component d drawn from md5("hp{j}-{d}") — the
    * LSH block key for high-cosine candidate joins ([[graft.operators.Dedup]]
    * d6's blocking and the mining family's scale path). ONE definition:
    * the DuckDB oracles re-derive these exact planes as SQL literals, so
    * every Scala call site must share one seed/threshold or the
    * cross-engine agreement silently breaks. */
  def hyperplaneSketch(v: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { j =>
      val hj = typedLit((0 until dim).map(d =>
        if (Integer.parseInt(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(s"hp$j-$d")
            .substring(0, 2), 16) < 128) 1.0 else -1.0))
      when(dot(v, hj) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
}

/** Symmetric per-vector int8 quantization — the memory-bound scale path for
  * vector search: an `array<int8-valued int>` + one double scale is ~4× smaller
  * at rest and in shuffle than the float vector, and the dequantized dot product
  * stays within ~1% of exact cosine on unit vectors. All pure, deterministic
  * column math (floor-based half-up rounding so the DuckDB oracle reproduces it
  * bit-for-bit).
  *
  * Usage discipline: project `scaleOf` as a named column BEFORE passing it to
  * [[quantize]]/[[dequantize]] — an inline aggregate would be re-evaluated per
  * element by Catalyst's lambda inlining.
  */
object Quantize {
  import org.apache.spark.sql.functions._

  /** Per-vector scale: max|v| / 127 (zero vector ⇒ 0). Order-independent, so
    * exact across engines. */
  def scaleOf(v: Column): Column =
    aggregate(v, lit(0.0d), (a, x) => greatest(a, abs(x.cast("double")))) / 127.0

  /** v → int8-range codes: floor(x/scale + 0.5) clamped to [-127, 127]. */
  def quantize(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v,
        x => greatest(lit(-127), least(lit(127),
          floor(x.cast("double") / scale + 0.5).cast("int")))))

  /** codes → approximate vector (q · scale), double-typed for scoring. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}

/** Sign-bit binary signatures — the most aggressive embedding compression
  * (1 bit/dim, 32× smaller than float32 at rest and in shuffle) with Hamming
  * distance scored as XOR + popcount, both codegen'd integer ops. For
  * L2-normalized vectors Hamming on sign bits is a monotone proxy for angular
  * distance (the 1-hyperplane-per-axis special case of SimHash, already used
  * for near-dup blocking in `Dedup.simHashBuckets`); here it serves retrieval:
  * a signature scan touches 8 bytes/vector instead of 256, so the 100 TB shape
  * is signature-scan → top-R shortlist → exact float rerank of R rows (the
  * same two-stage contract as `IvfPq.searchSaved`'s ADC → refine).
  *
  * Words pack 32 bits each into a non-negative BIGINT, so the arithmetic (and
  * the DuckDB oracle's) never touches the sign bit — `1::BIGINT << 63` is UB
  * territory in some engines and a negative surprise in the rest. */
object BinarySign {
  import org.apache.spark.sql.functions._

  /** Bits [lo, lo+31] of v's sign pattern (bit j set ⇔ v(lo+j) > 0) as one
    * non-negative long. Pure integer fold — exact across engines. */
  def packWord(v: Column, lo: Int): Column =
    aggregate(sequence(lit(lo), lit(lo + 31)), lit(0L),
      (acc, i) => acc + when(element_at(v, i + lit(1)) > lit(0f),
        call_function("shiftleft", lit(1L), i - lit(lo))).otherwise(lit(0L)))

  /** Hamming distance between two 2-word signatures: Σ popcount(a XOR b). */
  def hamming2(a0: Column, a1: Column, b0: Column, b1: Column): Column =
    (bit_count(a0.bitwiseXOR(b0)) + bit_count(a1.bitwiseXOR(b1))).cast("int")
}
