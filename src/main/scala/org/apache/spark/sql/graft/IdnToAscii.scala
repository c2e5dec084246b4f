package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst wrapper over [[graft.functions.IdnCodec.toAscii]] — IDN
  * host → punycode ASCII as a codegen'd column function, so the URL
  * canonicalization pipeline ([[graft.functions.UrlOps]]) stays entirely
  * inside whole-stage codegen (the engine's no-UDF-in-the-hot-path rule).
  *
  * Identity on all-ASCII input (byte-identical, buffer reused), null in →
  * null out. Lives under `org.apache.spark.sql.*` like [[DotProduct]]
  * (private[sql] codegen types).
  */
case class IdnToAscii(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    graft.functions.IdnCodec.toAsciiUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdnCodec.toAsciiUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnToAscii =
    copy(child = newChild)
}
