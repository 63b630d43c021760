package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** array<string> → array<struct<term:string, tf:int>> — per-document term
  * frequency as a SCALAR expression.
  *
  * This is the SPIMI observation that makes the postings build scale: a
  * document's term frequencies depend only on that document, so counting
  * belongs in the map phase as an O(dl log dl) per-row operation — NOT in
  * a corpus-wide groupBy(term, doc_id), whose hash aggregation over
  * |postings| ≈ 10^11 groups dominated the build (measured: the global
  * agg cost 18× the tokenize itself). Output is term-sorted (byte order,
  * matching Spark's UTF8String ordering) for determinism.
  *
  * Reference analog: the per-passage token→code histogram inside
  * collection_indexer's encode loop (colbert/indexing/collection_indexer.py
  * :346-356) — also computed per chunk, never globally.
  */
object TermCounts {
  def term_counts(c: Column): Column =
    GraftShim.column(TermCountsExpr(GraftShim.expression(c)))
}

case class TermCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_counts"
  override def nullSafeEval(input: Any): Any =
    TermCountsExpr.termCountsEval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.TermCountsExpr.termCountsEval($c)")
  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
}

object TermCountsExpr {
  def termCountsEval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val terms = new Array[UTF8String](n)
    var i = 0
    while (i < n) { terms(i) = arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(terms.asInstanceOf[Array[AnyRef]])
    val out = new java.util.ArrayList[Any](n)
    var runStart = 0
    i = 1
    while (i <= n) {
      if (i == n || !terms(i).equals(terms(runStart))) {
        out.add(new GenericInternalRow(Array[Any](terms(runStart), i - runStart)))
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
