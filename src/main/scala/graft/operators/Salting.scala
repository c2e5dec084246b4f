package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for hot keys (hub entities, stop-shingles, celebrity users).
  *
  * A single `groupBy(key).agg(collect_set(...))` sends every row of a hot key to
  * one reducer. Salted two-phase aggregation splits each key into `buckets`
  * sub-keys (salt = hash of the VALUE, so identical values co-locate and pre-dedupe
  * in phase 1), aggregates partials, then merges the — now bounded —
  * per-key partial lists. Shuffle for the hot key drops from O(rows) to
  * O(buckets × distinct_values/bucket) in phase 2.
  *
  * AQE's skew-join splitting handles joins; this covers the aggregation side,
  * which AQE does not rebalance.
  */
object Salting {

  /** `collect_set(value) GROUP BY key`, salted. Output: (key, <value>s sorted). */
  def saltedCollectSet(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial")))))
        .as(s"${valueCol}s"))

  /** Salted count-distinct (exact): same two-phase shape. */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"n_${valueCol}"))
}
