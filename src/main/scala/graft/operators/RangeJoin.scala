package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale-safe physical plan for `point BETWEEN lo AND
  * hi` predicates (event-to-window attribution, time-range enrichment,
  * numeric-interval lookups). The reference has no range predicate anywhere
  * (SURVEY §2.10 "no sort-merge/range/as-of/theta joins"); this and
  * [[AsOfJoin]] round out the join family a training-data pipeline needs.
  *
  * Spark's built-in answer to a non-equi range predicate is
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) compares, a
  * scale-killer the moment the interval side outgrows a broadcast. The
  * standard fix (DuckDB reaches the same plan internally via its IEJoin;
  * Flink/KafkaSQL interval joins bin the time axis the same way) is to
  * discretize: chop the domain into fixed-width bins, explode each interval
  * into the bins it covers, tag each point with its single bin, equi-join on
  * the bin id, and re-check the exact predicate. The join becomes a plain
  * shuffled/broadcast HASH join on the bin key — partitioned, codegen'd,
  * AQE-planned like any other equi-join.
  *
  * Each output pair is emitted exactly once (a point has ONE bin; an interval
  * appears in that bin at most once), so no post-dedup is needed. Bin width
  * tunes fan-out: intervals explode into `len/width + 1` rows, so pick width
  * on the order of the typical interval length — fan-out stays a small
  * constant and the explode is linear in the interval count.
  */
object RangeJoin {

  /** Join `points` to every interval with `lo <= pt < hi` (half-open).
    * `ptCol`/`loCol`/`hiCol` must be INTEGRAL (long/int/short — enforced):
    * fractional domains would be silently truncated by the binning cast and
    * drop valid matches; scale them to integers first (ticks, cents, nanos).
    * Empty intervals (`hi <= lo`) match nothing. Output: all point columns +
    * all interval columns. Column name collisions are the caller's contract
    * (rename first); `_bin` is reserved. */
  // Bin ids via integral `div`, never float division: epoch-nanos exceed
  // 2^53, where double arithmetic mis-rounds a value sitting exactly on a
  // bin boundary and silently mis-bins it. `div` truncates toward zero
  // rather than flooring, but it is monotone, and monotone is all the cover
  // proof needs: lo <= pt < hi implies bin(lo) <= bin(pt) <= bin(hi-1), so
  // a member's bin is always inside its interval's exploded range.
  private def binOf(c: Column, binWidth: Long): Column =
    call_function("div", c.cast("long"), lit(binWidth))

  /** The binning cast truncates fractional values, which would silently DROP
    * matches (a point on a bin edge mis-bins away from its interval) — so
    * non-integral domain columns are rejected outright. */
  private def requireIntegral(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      val t = df.schema(c).dataType
      require(t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType ||
        t == org.apache.spark.sql.types.ShortType ||
        t == org.apache.spark.sql.types.ByteType,
        s"range-join column '$c' must be integral, got $t — scale fractional " +
          "domains to integers (ticks/cents/nanos) first")
    }

  private def binnedIntervals(df: DataFrame, lo: String, hi: String,
      binWidth: Long): DataFrame = df
    .filter(col(hi) > col(lo)) // empty intervals match nothing
    .withColumn("_bin", explode(sequence(
      binOf(col(lo), binWidth), binOf(col(hi) - 1, binWidth))))

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(points, ptCol)
    requireIntegral(intervals, loCol, hiCol)
    points
      .withColumn("_bin", binOf(col(ptCol), binWidth))
      .join(binnedIntervals(intervals, loCol, hiCol, binWidth), Seq("_bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("_bin")
  }

  /** Interval×interval overlap join: every `(left, right)` pair of NON-EMPTY
    * intervals with `aLo < bHi AND bLo < aHi` (half-open overlap; empty
    * intervals — `hi <= lo` — contain no points and match nothing, on either
    * side). Integral columns only, as in [[pointInInterval]]. Both sides
    * explode into their covered bins and equi-join on the bin id; a pair
    * sharing several
    * bins would surface once per shared bin, so each is emitted ONLY from
    * the bin containing `greatest(aLo, bLo)` — the canonical
    * one-bin-owns-the-pair rule, giving exactly-once output with no
    * distinct/dedup shuffle. Left columns must not collide with right
    * columns (`_bin` reserved). */
  def intervalOverlap(left: DataFrame, aLo: String, aHi: String,
      right: DataFrame, bLo: String, bHi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(left, aLo, aHi)
    requireIntegral(right, bLo, bHi)
    binnedIntervals(left, aLo, aHi, binWidth)
      .join(binnedIntervals(right, bLo, bHi, binWidth), Seq("_bin"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("_bin") === binOf(greatest(col(aLo), col(bLo)), binWidth))
      .drop("_bin")
  }
}
