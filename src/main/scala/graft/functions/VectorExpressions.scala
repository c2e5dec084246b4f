package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, DotProduct}

/** Column-level vector math (SURVEY §2.5 E3, §2.6). Everything stays in Catalyst —
  * either the native codegen'd [[org.apache.spark.sql.graft.DotProduct]] expression
  * or codegen'd higher-order functions; no UDFs in the hot path. */
object VectorFunctions {
  import org.apache.spark.sql.functions._

  /** Native codegen dot product (preferred). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Spec-form dot product via higher-order functions (kept as the readable
    * semantic definition and codegen-fallback cross-check; `dot` is the fast path). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖v‖₂ in double precision (embeddings.py:142-143). */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** v / ‖v‖₂, zero vectors left untouched (embeddings.py:180-203: empty text ⇒
    * zero vector, which must survive normalization without NaNs). */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, transform(v, x => x.cast("double")))
      .otherwise(transform(v, x => x.cast("double") / n))
  }

  /** Cosine similarity; 0 when either side is a zero vector. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }
}
