package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The house oracle-replicable hash, defined once.
  *
  * First 8 md5 hex chars as a BIGINT — 32 bits, always non-negative, and
  * reproducible in any SQL engine as
  * `CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`. Every deterministic
  * sampling / splitting / bucketing decision in the engine routes through
  * this arithmetic (train/eval splits, stratified and weighted sampling,
  * bootstrap draws, permutation signs, NN-descent buckets), so a DuckDB
  * twin reproduces the exact choice set with no RNG state and retries or
  * repartitionings cannot change an answer. */
object Hashing {

  /** md5-arithmetic hash of a string column (non-string inputs: cast before
    * calling so the SQL twin's CAST matches the Spark cast). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit variant (first 15 md5 hex chars) for draws taken MODULO a
    * runtime total — `md5Long % tot` silently stops reaching values above
    * 2³² once tot exceeds 2³² (every high-cumulative candidate becomes
    * unpickable), so weighted inverse-CDF sampling (biasedWalks) draws from
    * 60 bits instead. SQL twin:
    * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
