package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** (entries: array<struct<doc_id,tf,dl>>, avgdl: double) →
  * struct<n:int, doc_ids_enc:binary, tfs_enc:binary, dls_enc:binary,
  * block_max_tfnorm:double> — the whole posting-block encode as ONE fused
  * pass: sort by docId, delta+varint the ids, varint tf/dl, and compute
  * the block-max WAND bound, all over primitive arrays.
  *
  * Replaces a sort_array(array<struct>) + three transform() passes + three
  * varint expressions + a separate max() aggregate — measured the
  * dominant allocation source of the blocks stage (reference analog: the
  * fused residual compress kernel, colbert/indexing/codecs/residual.py
  * :167-202).
  */
object BlockEncode {
  def block_encode(entries: Column, avgdl: Column, k1: Double, b: Double): Column =
    GraftShim.column(BlockEncodeExpr(
      GraftShim.expression(entries), GraftShim.expression(avgdl), k1, b))
}

case class BlockEncodeExpr(left: Expression, right: Expression, k1: Double, b: Double)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("doc_ids_enc", BinaryType, nullable = false),
    StructField("tfs_enc", BinaryType, nullable = false),
    StructField("dls_enc", BinaryType, nullable = false),
    StructField("block_max_tfnorm", DoubleType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "block_encode"

  override def nullSafeEval(entries: Any, avgdl: Any): Any =
    BlockEncodeExpr.blockEncodeEval(
      entries.asInstanceOf[ArrayData], avgdl.asInstanceOf[Double], k1, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, a) =>
      s"graft.codec.BlockEncodeExpr.blockEncodeEval($e, $a, $k1, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BlockEncodeExpr =
    copy(left = newLeft, right = newRight)
}

object BlockEncodeExpr {
  def blockEncodeEval(entries: ArrayData, avgdl: Double, k1: Double, b: Double): GenericInternalRow = {
    val n = entries.numElements()
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    var minId = Long.MaxValue
    var i = 0
    while (i < n) {
      val row = entries.getStruct(i, 3)
      docIds(i) = row.getLong(0)
      tfs(i) = row.getInt(1)
      dls(i) = row.getInt(2)
      if (docIds(i) < minId) minId = docIds(i)
      i += 1
    }
    // order by docId: pack (relId, idx) into one long — relIds within a
    // block are bounded by blockSpan, so rel*(n+1)+idx never collides
    val packed = new Array[Long](n)
    i = 0
    while (i < n) { packed(i) = (docIds(i) - minId) * (n + 1L) + i; i += 1 }
    java.util.Arrays.sort(packed)

    val sIds = new Array[Long](n)
    val sTfs = new Array[Int](n)
    val sDls = new Array[Int](n)
    var maxTfnorm = 0.0
    i = 0
    while (i < n) {
      val idx = (packed(i) % (n + 1L)).toInt
      sIds(i) = docIds(idx)
      sTfs(i) = tfs(idx)
      sDls(i) = dls(idx)
      val tf = tfs(idx).toDouble
      val tfnorm = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dls(idx) / avgdl))
      if (tfnorm > maxTfnorm) maxTfnorm = tfnorm
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n, Varint.deltaEncode(sIds), Varint.encodeInts(sTfs), Varint.encodeInts(sDls),
      maxTfnorm))
  }
}
