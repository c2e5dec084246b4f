package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that is an EVALUATION BARRIER for the optimizer.
  *
  * `CollapseProject` inlines a deterministic alias into every consumer when
  * projections merge — for a multi-referenced expensive expression (e.g. a
  * regex tokenize whose array feeds ~50 `element_at` calls inside a
  * `transform` lambda) that means re-evaluating it per reference per row
  * (measured 24.5 s vs 6 s on the rag pipeline's normTokens at sf0.1). The
  * standing workaround was `localCheckpoint(true)`: correct, but it pays a
  * whole corpus-scale materialization job just to pin evaluation.
  *
  * This wrapper reports `deterministic = false`, which Catalyst must not
  * duplicate or reorder — the alias stays in its own Project, evaluated ONCE
  * per row, while whole-stage codegen still fuses the adjacent projections
  * into one stage (the value flows through a local variable, nothing is
  * materialized). Evaluation and codegen delegate straight to the child, so
  * the wrapper costs nothing at runtime. Use it where a projection barrier
  * (not a storage barrier) is the actual requirement; keep checkpoints where
  * reuse across ACTIONS is the point.
  *
  * SCOPE: the barrier guards across PROJECTIONS — it must wrap a column that
  * gets its own alias, with consumers referencing the attribute. Nested
  * inside a larger expression (e.g. `shingles(evalOnce(tokens), n)` in one
  * select) it is just a node in that expression tree and the child still
  * evaluates once per lambda-index reference (measured on sim1: 11.6 s
  * nested vs 2.1 s as its own column).
  */
case class EvalBarrier(child: Expression) extends UnaryExpression {
  // the whole point: never inlined, never duplicated, never pushed around
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): EvalBarrier =
    copy(child = newChild)
}
