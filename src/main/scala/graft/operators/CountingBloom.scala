package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, BitsetGet}

/** Removable membership sketch — counting Bloom filter (s12). x20's plain
  * Bloom cannot forget: one `removed` row in a snapshot diff forces a full
  * sketch rebuild over the surviving corpus. Counters can: the state is the
  * per-position insertion count, ADDITIVE under both inserts (+1 per hash
  * position) and removes (−1), so maintenance from a
  * [[CorpusOps.snapshotDiff]] delta is delta-sized work and — because
  * addition commutes — BIT-EQUAL to a rebuild from the surviving key
  * multiset (Round16OpsSpec pins it).
  *
  * State shape: (pos INT, cnt BIGINT, m INT, h INT, kt STRING) — m/h/kt are
  * constant marker columns (the Bm25 stats-marker precedent): a probe or
  * maintenance batch hashed with a different modulus, hash count, or key
  * DTYPE than the build would miss bits and silently drop PRESENT keys
  * (false negatives, which the exact-confirm backstop cannot repair), so
  * every consumer revalidates against the persisted triple and fails
  * loudly on drift. Row count ≤ min(h·n, m), driver-bounded by `m`
  * regardless of corpus size. Probing collapses the counters to a bitset
  * (cnt > 0, m/8 bytes) that rides the plan as a binary literal and is
  * tested per row by the codegen'd [[org.apache.spark.sql.graft.BitsetGet]]
  * expression — the bf1/x20 plan shape (probe inside whole-stage codegen,
  * no UDF), with the same exact-confirm backstop making every consumer's
  * OUTPUT independent of m/h/false positives.
  *
  * Multiset discipline (the classic counting-Bloom contract): only remove
  * keys that were previously added, as many times as they were added — a
  * snapshot diff satisfies this by construction (`removed` ⊆ old corpus).
  * Removing a never-added key would drive counters negative and could mask
  * a genuinely present key, so [[bitset]] fails loudly on any negative
  * counter instead.
  *
  * Positions: pos_i(k) = xxhash64(k, i) mod m for i in 0..h−1 — the (key,
  * seed-index) tuple through Spark's native codegen'd hash, identical at
  * build and probe. Not SQL-replayed: consumers' oracles are
  * fpp-independent by the exact-confirm backstop (the x20 adjudication).
  */
object CountingBloom {

  private def keyType(df: DataFrame, keyCol: String): String =
    df.schema(keyCol).dataType.simpleString

  /** h hash positions per key, exploded to (pos) rows. */
  private def positions(keys: DataFrame, keyCol: String, m: Int, h: Int): DataFrame = {
    require(m > 0 && (m & 7) == 0, s"m must be a positive multiple of 8, got $m")
    require(h > 0, s"h must be > 0, got $h")
    keys.select(explode(array((0 until h).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(m.toLong)).cast("int")): _*)).as("pos"))
  }

  /** The persisted (m, h, kt) marker of a state frame; ("", default m/h)
    * never escapes — empty states short-circuit in each consumer. */
  private def marker(state: DataFrame): (Int, Int, String) =
    state.select(col("m"), col("h"), col("kt")).limit(1).collect().headOption
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
      .getOrElse((8, 1, ""))

  private def withMarker(counts: DataFrame, m: Int, h: Int, kt: String): DataFrame =
    counts.withColumn("m", lit(m)).withColumn("h", lit(h))
      .withColumn("kt", lit(kt))

  /** Counter state from a key multiset: one shuffle of (pos, partial-count)
    * pairs (map-side combined; width ≤ m rows, never corpus-sized). */
  def counters(keys: DataFrame, keyCol: String, m: Int = 1 << 18,
               h: Int = 5): DataFrame =
    withMarker(
      positions(keys, keyCol, m, h).groupBy("pos").agg(count(lit(1)).as("cnt")),
      m, h, keyType(keys, keyCol))

  /** Apply a snapshot delta: +1 per hash position of `added`, −1 per hash
    * position of `removed`; zeroed positions drop so the state stays the
    * support of the counter function. m/h/key-dtype come FROM the state's
    * marker — a caller cannot hash the delta differently than the build.
    * A marker-less state (zero counter rows — nothing ever inserted, e.g. a
    * stream's first batch) adopts `mIfEmpty`/`hIfEmpty` and the delta's own
    * key dtype; removes against it go NEGATIVE and surface loudly at the
    * next [[bitset]], never silently drop. Work ∝ |delta|, state ≤ m rows. */
  def maintain(state: DataFrame, added: DataFrame, removed: DataFrame,
               keyCol: String, mIfEmpty: Int = 1 << 18,
               hIfEmpty: Int = 5): DataFrame = {
    val (m0, h0, kt0) = marker(state)
    val (m, h) = if (kt0.isEmpty) (mIfEmpty, hIfEmpty) else (m0, h0)
    val kt = if (kt0.isEmpty) keyType(added, keyCol) else kt0
    Seq("added" -> added, "removed" -> removed).foreach { case (which, df) =>
      val dt = keyType(df, keyCol)
      require(dt == kt,
        s"CountingBloom.maintain: $which.$keyCol dtype $dt != state key dtype " +
          s"$kt — xxhash64 is type-sensitive; a mismatch means silent false negatives")
    }
    withMarker(
      state.select("pos", "cnt")
        .unionByName(positions(added, keyCol, m, h)
          .groupBy("pos").agg(count(lit(1)).as("cnt")))
        .unionByName(positions(removed, keyCol, m, h)
          .groupBy("pos").agg((-count(lit(1))).as("cnt")))
        .groupBy("pos").agg(sum(col("cnt")).as("cnt"))
        .filter(col("cnt") =!= 0),
      m, h, kt)
  }

  /** Incremental-vs-full decision: maintenance costs O(|delta|·h) and a
    * rebuild costs O(|newCorpus|·h); below `threshold` the delta path wins
    * outright, above it the constant factors (two extra unions + the state
    * scan) stop paying for themselves. Either path yields IDENTICAL
    * counters — this chooses cost, never semantics.
    *
    * The default is MEASURED, not asserted (r17, graft.SweepMaintain over
    * the 600k-key sf0.1 lineitem multiset — curve in the README): maintain
    * won at delta/new <= 0.43 (0.77 s vs 0.86 s) and lost at 0.67 (0.87 s
    * vs 0.73 s), an interpolated crossover of ~0.52; 0.5 keeps a small
    * margin under it. (The r16 value 0.3 was safe but left wins on the
    * table between 0.3 and 0.5.) The crossover is HARDWARE-DEPENDENT —
    * measured on one 32-core local[32] box with local-disk parquet, and
    * the ~4% margin under it is thin: slower storage or fewer cores shifts
    * the curve, so recalibrate by re-running `graft.SweepMaintain` on the
    * target hardware (the README table documents the procedure) and pass
    * the measured threshold explicitly rather than trusting the default. */
  def chooseMaintain(nDelta: Long, nNew: Long, threshold: Double = 0.5): Boolean =
    nDelta < threshold * math.max(nNew, 1L)

  /** Collapse counters to a probe bitset: bit pos set iff cnt > 0; sized by
    * the state's own m (collected — bounded by m, the sketch-size contract,
    * independent of corpus size). Fails loudly on negative counters: that
    * is a multiset-discipline violation upstream and means probes could
    * false-NEGATIVE, which the exact-confirm consumers cannot repair. */
  def bitset(state: DataFrame): Array[Byte] = {
    val (m, _, _) = marker(state)
    val bytes = new Array[Byte](m / 8)
    state.select(col("pos"), col("cnt")).collect().foreach { r =>
      val pos = r.getInt(0)
      val cnt = r.getLong(1)
      require(cnt >= 0, s"CountingBloom: negative counter at pos=$pos " +
        s"(cnt=$cnt) — a key was removed more times than it was added; " +
        "membership probes could silently drop present keys")
      if (cnt > 0) {
        require(pos >= 0 && pos < m, s"position $pos outside m=$m")
        bytes(pos >> 3) = (bytes(pos >> 3) | (1 << (pos & 7))).toByte
      }
    }
    bytes
  }

  /** Codegen'd membership probe: AND over the h bit tests, the bitset as ONE
    * shared binary literal. False positives possible (rate set by m/h vs
    * set size), false negatives impossible under multiset discipline. */
  def mightContain(bits: Array[Byte], key: Column, h: Int = 5): Column = {
    val blit = org.apache.spark.sql.catalyst.expressions.Literal
      .create(bits, org.apache.spark.sql.types.BinaryType)
    (0 until h).map { i =>
      Bridge.column(BitsetGet(blit,
        Bridge.expression(pmod(xxhash64(key, lit(i)), lit(bits.length.toLong * 8)))))
    }.reduce(_ && _)
  }

  /** Membership filter with the exact-confirm backstop (x20's adjudication):
    * rows of `probe` whose key is in `truth` — the sketch prunes the probe
    * side BEFORE its shuffle, the equi-join on the sketch-passing candidates
    * removes the false positives, so the OUTPUT is independent of m/h/fpp
    * and equals a plain left-semi join. m and h come from the state marker;
    * the probe key's dtype must match the build's (enforced). */
  def semiJoin(probe: DataFrame, probeKey: String, state: DataFrame,
               truth: DataFrame, truthKey: String): DataFrame = {
    val (_, h, kt) = marker(state)
    val pt = keyType(probe, probeKey)
    require(kt.isEmpty || pt == kt,
      s"CountingBloom.semiJoin: probe.$probeKey dtype $pt != state key dtype " +
        s"$kt — xxhash64 is type-sensitive; a mismatch means silent false negatives")
    val might = mightContain(bitset(state), col(probeKey), h)
    probe.filter(col(probeKey).isNotNull && might)
      .join(truth.select(col(truthKey).as(probeKey)), Seq(probeKey), "left_semi")
  }

  /** Decontamination form — rows of `corpus` NOT in the maintained set
    * (the [[CorpusOps.bloomDecontaminate]] shape, with a sketch that can
    * FORGET): sketch-clean rows pass directly, sketch-hits are exact-
    * confirmed against `evalKeys` so false positives survive — output ≡
    * a plain left-anti join regardless of m/h/fpp. This is the x20
    * call-site a snapshot-diff-maintained eval set needs: eval-set removals
    * maintain the counters instead of forcing a sketch rebuild. The corpus
    * is scanned twice (clean ∪ confirmed) — checkpoint nondeterministic
    * inputs first (the bloomDecontaminate precondition). */
  def antiJoin(corpus: DataFrame, corpusKey: String, state: DataFrame,
               evalKeys: DataFrame, evalKeyCol: String): DataFrame = {
    val (_, h, kt) = marker(state)
    val ct = keyType(corpus, corpusKey)
    require(kt.isEmpty || ct == kt,
      s"CountingBloom.antiJoin: corpus.$corpusKey dtype $ct != state key dtype " +
        s"$kt — xxhash64 is type-sensitive; a mismatch means silent false negatives")
    val might = mightContain(bitset(state), col(corpusKey), h)
    val candidates = corpus.filter(might)
      .join(evalKeys.select(col(evalKeyCol).as(corpusKey)).distinct(),
        Seq(corpusKey), "left_anti")
    corpus.filter(!might)
      .unionByName(candidates.select(corpus.columns.map(col): _*))
  }
}
