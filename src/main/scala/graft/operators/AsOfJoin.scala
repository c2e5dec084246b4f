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
}
