package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.DotProduct

/** SQL surface for graft's custom Catalyst expressions.
  *
  * `dot_product(a, b)` becomes available in `spark.sql(...)` either by config
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, applied at session build)
  * or imperatively via [[GraftFunctions.register]] on a live session. No custom
  * Rule/SparkStrategy is required for parity (SURVEY §7.4) — the one operator
  * Spark lacks is the scalar dot product, and an expression suffices.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotProductDescription)
    e.injectFunction(GraftFunctions.cosineSimDescription)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}

  private def cosineExpr(a: Expression, b: Expression): Expression =
    new Divide(DotProduct(a, b),
      new Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))

  private[plans] val dotProductDescription = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_product"),
    (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))

  // Composed from the codegen'd DotProduct — NaN on zero vectors, like the
  // plain SQL formula would be (the Column-level VectorFunctions.cosine guards
  // zero vectors; SQL callers can wrap in nanvl).
  private[plans] val cosineSimDescription = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "cosine_sim"),
    (exprs: Seq[Expression]) => cosineExpr(exprs(0), exprs(1)))

  /** Register graft functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => cosineExpr(exprs(0), exprs(1)), "scala_udf")
  }
}
