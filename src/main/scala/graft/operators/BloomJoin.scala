package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

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
  * Single-JVM honesty: on local[n] the shuffle is memory-speed, so the
  * prefilter cannot win here — its win condition is a network shuffle whose
  * byte volume drops by the probe-side miss rate (measured and printed by
  * the spec: ~98% of rows pruned pre-shuffle at the board query's 2%-
  * selective key set). The sketch itself is built with one distributed
  * aggregation (`DataFrameStatFunctions.bloomFilter`) and broadcast; its
  * size is driver-bounded by `expectedKeys`/`fpp`, independent of the probe
  * side.
  */
object BloomJoin {

  /** Left-semi join of `probe` against `keys`, Bloom-prefiltered on the
    * probe side. Long keys (the id convention of every graft table).
    * `expectedKeys` sizes the sketch — pass the key-side row estimate; an
    * undersized sketch only raises the false-positive rate (correctness is
    * unaffected, the exact join backstops it). */
  def semiJoin(probe: DataFrame, keys: DataFrame, probeKey: String,
               keyCol: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    require(expectedKeys > 0, s"expectedKeys must be > 0, got $expectedKeys")
    val bf: BloomFilter = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    // no distinct on the key side: left_semi semantics already dedup the
    // build side, and a pre-distinct would add a full extra shuffle over
    // exactly the relation this operator's premise says is big
    probe.filter(col(probeKey).isNotNull && mightContain(col(probeKey)))
      .join(keys.select(col(keyCol).as(probeKey)), Seq(probeKey), "left_semi")
  }

  /** Fraction of probe rows the sketch passes (diagnostic for the spec and
    * bench notes — the shuffle-bytes cut a cluster would see is 1 − this). */
  def passRate(probe: DataFrame, keys: DataFrame, probeKey: String,
               keyCol: String, expectedKeys: Long, fpp: Double = 0.01): Double = {
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    val total = probe.count()
    if (total == 0) 0.0
    else probe.filter(mightContain(col(probeKey))).count().toDouble / total
  }
}
