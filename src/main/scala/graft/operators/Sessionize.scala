package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Gap-based sessionization: a new session starts when the time since the user's
  * previous event exceeds `gap`. One shuffle on the user key, one per-partition
  * sort, two window passes (lag + running count) — the standard scalable shape;
  * the streaming twin lives in [[graft.streaming.StreamingOps]]. */
object Sessionize {

  /** events(userCol, tsCol ascending within user). Adds `session_seq` (1-based
    * per-user session index) and `session_id` (user‖seq). `tsCol` may be any
    * numeric/timestamp type castable to long (here: epoch nanos). */
  def byGap(events: DataFrame, userCol: String, tsCol: String, gapNanos: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
    val newSession = when(
      col(tsCol).cast("long") - lag(col(tsCol).cast("long"), 1).over(byUser) > gapNanos, 1)
      .otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("session_seq",
        (sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) + 1)
          .cast("int"))
      .drop("__new")
      .withColumn("session_id", concat_ws("-", col(userCol), col("session_seq")))
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(sessionized: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame =
    sessionized.groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
}
