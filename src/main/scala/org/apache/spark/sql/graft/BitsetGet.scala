package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._

/** Bit test into a binary bitset column: `BitsetGet(bytes, pos)` is true iff
  * bit `pos` (little-endian within each byte: bit i of byte pos/8 is
  * pos%8) of `bytes` is set; out-of-range positions are false (a membership
  * sketch must read "absent", never throw, when probed with a position its
  * bitset was not sized for).
  *
  * This is the probe primitive behind the removable counting-Bloom
  * membership sketch ([[graft.operators.CountingBloom]]): the maintained
  * counter table collapses to a bitset (cnt > 0) that rides the plan as a
  * binary literal, and the per-row probe stays inside whole-stage codegen —
  * the same plan shape as Spark's own `BloomFilterMightContain`, which
  * cannot be reused here because its byte format is `BloomFilterImpl`'s and
  * there is no public way to construct one from externally-maintained bits.
  *
  * Lives under `org.apache.spark.sql.*` beside [[DotProduct]] (catalyst
  * expression construction is this repo's one sanctioned internal-API
  * touchpoint). */
case class BitsetGet(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bitset_get"

  override def nullSafeEval(bytesAny: Any, posAny: Any): Any = {
    val bytes = bytesAny.asInstanceOf[Array[Byte]]
    val pos = posAny.asInstanceOf[Long]
    if (pos < 0 || pos >= bytes.length.toLong * 8) false
    else ((bytes((pos >> 3).toInt) >> (pos & 7).toInt) & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, pos) => {
      s"""
         |if ($pos < 0 || $pos >= ((long) $bytes.length) * 8L) {
         |  ${ev.value} = false;
         |} else {
         |  ${ev.value} = (($bytes[(int) ($pos >> 3)] >> (int) ($pos & 7)) & 1) == 1;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitsetGet =
    copy(left = l, right = r)
}
