package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving bucket assignment against a FROZEN sorted boundary
  * list: bucket(u) = #{boundaries b : b <= u}, by binary search.
  *
  * This is the query half of the docId-assignment protocol
  * ([[IndexBuilder.planDocIds]]): pass 1 captures the boundaries a range
  * sampler actually chose plus exact per-range counts; this expression
  * lets pass 2 re-derive the identical order-preserving partitioning
  * WITHOUT re-sampling (repartitionByRange samples nondeterministically
  * per execution) and without persisting the full corpus between the two
  * passes. O(log B) UTF8String binary compares per row — at 10^5+ range
  * splits on a real cluster a broadcast range-join (O(B) per row) or a
  * nested-loop join would be the scan bottleneck.
  *
  * Reference analog: the reference's per-chunk offset arithmetic that
  * globalizes passage ids across chunks (colbert/indexing/
  * collection_indexer.py:360-378) — here the "chunks" are the frozen url
  * ranges.
  */
object StringBucket {
  def bucket(c: Column, bounds: Array[UTF8String]): Column =
    GraftShim.column(StringBucketExpr(GraftShim.expression(c), bounds))

  /** Number of bounds <= u (bounds sorted ascending, binary compare —
    * the same byte-wise ordering Spark's string sort/range partitioner
    * uses). */
  def search(bounds: Array[UTF8String], u: UTF8String): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid).compareTo(u) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** See [[StringBucket]]. Null-intolerant (null url → null bucket; the
  * caller coalesces to bucket 0 — nulls sort first, so they belong to
  * the lowest range). */
case class StringBucketExpr(child: Expression, bounds: Array[UTF8String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"string_bucket needs a string child, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_bucket"
  override def nullSafeEval(input: Any): Any =
    StringBucket.search(bounds, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.index.StringBucket.search($b, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): StringBucketExpr =
    copy(child = newChild)
}
