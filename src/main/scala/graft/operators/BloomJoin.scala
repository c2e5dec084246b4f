package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Bloom-prefiltered semi-join — the shuffle-bytes cut for the 100 TB case
  * where the key side is too big to broadcast as a hash relation but its
  * Bloom sketch is not. The probe side is filtered by `mightContain` BEFORE
  * its shuffle, so only true matches plus the fpp tail of false positives
  * pay network; the exact semi-join afterwards removes the false positives,
  * making the operator output-identical to a plain left-semi join (which is
  * exactly what the oracle checks). This is the pattern Spark's own runtime
  * bloom-filter injection (SPARK-32268) applies when AQE statistics allow;
  * exposing it as an operator makes the cut available unconditionally and
  * with an explicit size/fpp contract.
  *
  * The probe is the NATIVE `BloomFilterMightContain` expression via
  * [[org.apache.spark.sql.graft.Bridge.bloomMightContain]] — the serialized
  * sketch rides the plan as a binary literal and the test participates in
  * whole-stage codegen, exactly like Spark's own injected runtime filters.
  * (r15: a per-row Scala UDF here broke codegen on the probe-side scan —
  * which is, by this operator's own premise, the 100 TB relation it exists
  * to optimize.) Build side and probe side both hash through `xxhash64`, so
  * their key columns must share ONE data type — xxhash64 is type-sensitive
  * and a mismatch would yield silent false NEGATIVES, dropping true matches
  * before the exact join can restore them (the bloomDecontaminate contract,
  * CorpusOps.scala).
  *
  * Single-JVM honesty: on local[n] the shuffle is memory-speed, so the
  * prefilter cannot win here — its win condition is a network shuffle whose
  * byte volume drops by the probe-side miss rate (measured and printed by
  * the spec: ~98% of rows pruned pre-shuffle at the board query's 2%-
  * selective key set). The sketch itself is built with one distributed
  * aggregation (`DataFrameStatFunctions.bloomFilter` over the xxhash64'd
  * keys) and shipped as a plan literal; its size is driver-bounded by
  * `expectedKeys`/`fpp`, independent of the probe side.
  */
object BloomJoin {

  /** Serialized Bloom sketch over `xxhash64(keyCol)` — one distributed
    * aggregation, driver-bounded bytes. Shared by semiJoin and passRate. */
  private def sketchBytes(keys: DataFrame, keyCol: String,
                          expectedKeys: Long, fpp: Double): Array[Byte] = {
    // drop null keys BEFORE hashing: xxhash64(NULL) is the (non-null) seed
    // constant, so an unfiltered null would insert a phantom key into the
    // sketch — stat.bloomFilter ignored nulls, this path must too
    val hashed = keys.filter(col(keyCol).isNotNull)
      .select(xxhash64(col(keyCol)).as("_h"))
    val bloom = hashed.stat.bloomFilter("_h", expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  private def requireSameType(probe: DataFrame, probeKey: String,
                              keys: DataFrame, keyCol: String): Unit = {
    val pt = probe.schema(probeKey).dataType
    val kt = keys.schema(keyCol).dataType
    require(pt == kt,
      s"BloomJoin: key types must match exactly (probe.$probeKey: $pt vs " +
        s"keys.$keyCol: $kt) — xxhash64 is type-sensitive, and a mismatch " +
        "yields silent bloom false negatives")
  }

  /** Left-semi join of `probe` against `keys`, Bloom-prefiltered on the
    * probe side. `expectedKeys` sizes the sketch — pass the key-side row
    * estimate; an undersized sketch only raises the false-positive rate
    * (correctness is unaffected, the exact join backstops it). */
  def semiJoin(probe: DataFrame, keys: DataFrame, probeKey: String,
               keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    require(expectedKeys > 0, s"expectedKeys must be > 0, got $expectedKeys")
    requireSameType(probe, probeKey, keys, keyCol)
    val might = Bridge.bloomMightContain(
      sketchBytes(keys, keyCol, expectedKeys, fpp), xxhash64(col(probeKey)))
    // no distinct on the key side: left_semi semantics already dedup the
    // build side, and a pre-distinct would add a full extra shuffle over
    // exactly the relation this operator's premise says is big
    probe.filter(col(probeKey).isNotNull && might)
      .join(keys.select(col(keyCol).as(probeKey)), Seq(probeKey), "left_semi")
  }

  /** Fraction of probe rows the sketch passes (diagnostic for the spec and
    * bench notes — the shuffle-bytes cut a cluster would see is 1 − this). */
  def passRate(probe: DataFrame, keys: DataFrame, probeKey: String,
               keyCol: String, expectedKeys: Long, fpp: Double = 0.01): Double = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    require(expectedKeys > 0, s"expectedKeys must be > 0, got $expectedKeys")
    requireSameType(probe, probeKey, keys, keyCol)
    val might = Bridge.bloomMightContain(
      sketchBytes(keys, keyCol, expectedKeys, fpp), xxhash64(col(probeKey)))
    val total = probe.count()
    if (total == 0) 0.0
    // null probe keys never pass (they cannot match a semi-join either):
    // xxhash64(NULL) is a non-null constant, so without the isNotNull guard
    // a null-heavy probe could read as near-1.0 pass rate (r16 review)
    else probe.filter(col(probeKey).isNotNull && might).count().toDouble / total
  }
}
