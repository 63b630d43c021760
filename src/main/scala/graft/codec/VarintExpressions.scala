package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Catalyst expressions around [[Varint]] — codegen'd via static calls so
  * the encode/decode stays inside whole-stage codegen (no UDF boundary).
  * These are the engine's analog of the reference's JIT-compiled
  * packbits/decompress kernels (colbert/indexing/codecs/residual.py:97-132,
  * 186-202, 240-276).
  */
object VarintExpressions {
  /** array<bigint> (strictly increasing) → binary (delta + varint). */
  def delta_varint_encode(c: Column): Column =
    GraftShim.column(DeltaVarintEncode(GraftShim.expression(c)))

  /** binary → array<bigint> (absolute ids). */
  def delta_varint_decode(c: Column): Column =
    GraftShim.column(DeltaVarintDecode(GraftShim.expression(c)))

  /** array<int> (non-negative) → binary (varint). */
  def varint_encode(c: Column): Column =
    GraftShim.column(VarintEncodeInts(GraftShim.expression(c)))

  /** binary → array<int>. */
  def varint_decode(c: Column): Column =
    GraftShim.column(VarintDecodeInts(GraftShim.expression(c)))

  // --- static eval entry points used by generated code ---
  def evalDeltaEncode(arr: ArrayData): Array[Byte] =
    Varint.deltaEncode(arr.toLongArray())

  def evalDeltaDecode(bytes: Array[Byte]): ArrayData =
    ArrayData.toArrayData(Varint.deltaDecode(bytes))

  def evalEncodeInts(arr: ArrayData): Array[Byte] =
    Varint.encodeInts(arr.toIntArray())

  def evalDecodeInts(bytes: Array[Byte]): ArrayData =
    ArrayData.toArrayData(Varint.decodeInts(bytes))
}

case class DeltaVarintEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "delta_varint_encode"
  override def nullSafeEval(input: Any): Any =
    VarintExpressions.evalDeltaEncode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.VarintExpressions.evalDeltaEncode($c)")
  override protected def withNewChildInternal(newChild: Expression): DeltaVarintEncode =
    copy(child = newChild)
}

case class DeltaVarintDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "delta_varint_decode"
  override def nullSafeEval(input: Any): Any =
    VarintExpressions.evalDeltaDecode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.VarintExpressions.evalDeltaDecode($c)")
  override protected def withNewChildInternal(newChild: Expression): DeltaVarintDecode =
    copy(child = newChild)
}

case class VarintEncodeInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "varint_encode"
  override def nullSafeEval(input: Any): Any =
    VarintExpressions.evalEncodeInts(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.VarintExpressions.evalEncodeInts($c)")
  override protected def withNewChildInternal(newChild: Expression): VarintEncodeInts =
    copy(child = newChild)
}

case class VarintDecodeInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "varint_decode"
  override def nullSafeEval(input: Any): Any =
    VarintExpressions.evalDecodeInts(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.VarintExpressions.evalDecodeInts($c)")
  override protected def withNewChildInternal(newChild: Expression): VarintDecodeInts =
    copy(child = newChild)
}
