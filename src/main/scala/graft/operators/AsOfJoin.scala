package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Backward as-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key (ties: the right row at equal time wins).
  *
  * Spark lacks this operator; rather than an O(n·m) theta-join we use the
  * union-sort trick: tag both sides, union, then one window sorted by
  * (key, time, side) carrying the last seen right value forward. Cost: ONE shuffle
  * on the key + a per-partition sort — the same complexity as a sort-merge join,
  * and it scales to arbitrarily large sides (no broadcast, no range explosion).
  */
object AsOfJoin {

  /** left(keyCol, leftTimeCol, ...), right(keyCol, rightTimeCol, valueCols...).
    * Returns left columns + the as-of values of `valueCols` (null when no earlier
    * right row exists). */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val l = left.select(
      col(keyCol).as("__k"), col(leftTimeCol).cast("long").as("__t"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"))
      .withColumns(valueCols.map(v => s"__v_$v" -> lit(null)).toMap)
    val r = right.select(
      Seq(col(keyCol).as("__k"), col(rightTimeCol).cast("long").as("__t"),
        lit(0).as("__side"), lit(null).cast(l.schema("__l").dataType).as("__l")) ++
        valueCols.map(v => col(v).as(s"__v_$v")): _*)
    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = l.unionByName(r)
      .withColumns(valueCols.map(v =>
        s"__asof_$v" -> last(col(s"__v_$v"), ignoreNulls = true).over(w)).toMap)
      .filter(col("__side") === 1)
    joined.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(v => col(s"__asof_$v").as(s"asof_$v")): _*)
  }

  /** Nearest join: for each left row, the right row on the same key that
    * minimizes |rightTime − leftTime| — backward wins ties (the earlier
    * right row), matching sensor-fusion/feature-alignment convention where
    * an already-observed value beats a future one at equal distance.
    *
    * Same union-sort economics as [[backward]]: ONE shuffle on the key, one
    * per-partition sort feeding two frame variants of the same window (last
    * non-null right struct carried forward, first carried backward), then a
    * per-row pick. No theta-join, no range explosion, arbitrarily large
    * sides.
    *
    * Precondition (same as [[backward]]'s dedup convention at call sites):
    * right rows unique per (key, time) — aggregate first, or the carried
    * value among equal times is tie-broken arbitrarily.
    *
    * Output: left columns + nearest value columns as `nearest_<v>` (null
    * when the key has no right rows at all). */
  def nearest(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val rv = struct(col(rightTimeCol).cast("long").as("t"),
      struct(valueCols.map(col): _*).as("v"))
    val r = right.select(
      col(keyCol).as("__k"), col(rightTimeCol).cast("long").as("__t"),
      lit(0).as("__side"), rv.as("__r"))
    val l = left.select(
      col(keyCol).as("__k"), col(leftTimeCol).cast("long").as("__t"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"))
    val u = l.withColumn("__r", lit(null).cast(r.schema("__r").dataType))
      .unionByName(r.withColumn("__l", lit(null).cast(l.schema("__l").dataType)))
    // right rows sort before left at equal time: an equal-time right value is
    // in the BACKWARD frame with distance 0, which wins the pick anyway
    val w = Window.partitionBy(col("__k")).orderBy(col("__t").asc, col("__side").asc)
    val back = last(col("__r"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val fwd = first(col("__r"), ignoreNulls = true)
      .over(w.rowsBetween(0, Window.unboundedFollowing))
    val picked = u
      .withColumn("__b", back).withColumn("__f", fwd)
      .filter(col("__side") === 1)
      .withColumn("__n",
        when(col("__f").isNull, col("__b"))
          .when(col("__b").isNull, col("__f"))
          .when(col("__t") - col("__b.t") <= col("__f.t") - col("__t"), col("__b"))
          .otherwise(col("__f")))
    picked.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(v => col(s"__n.v.$v").as(s"nearest_$v")): _*)
  }
}
