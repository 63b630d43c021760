package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** array<float|double> embedding → array<long>[tables] random-hyperplane
  * LSH bucket ids (Charikar 2002 sign-random-projection, the cosine-space
  * sibling of [[SimhashSignature]]), as ONE fused per-row pass — the
  * bucketed scale path for ANN over embeddings next to the IVF probe
  * (reference analog: the centroid bucketing of
  * colbert/indexing/utils.py:8-64; hyperplanes replace trained centroids
  * so bucketing needs NO training pass at all).
  *
  * Engine-portable by construction — every step is exact integer math, so
  * the DuckDB oracle reproduces buckets bit-for-bit with no float-ordering
  * hazard (a sign bit computed from an IEEE sum could flip between engines
  * that reduce in different orders):
  *
  *   ei[d]     = floor(double(emb[d]) · 10⁴) as int64   (same double in,
  *               same int out, on any engine)
  *   m(t,h,d)  = (t·bits + h)·D + d
  *   w(t,h,d)  = 2·(((m · 2654435761) mod 2³²) >> 16 & 1) − 1   ∈ {−1,+1}
  *               (Knuth multiplicative hash; bit 16 avoids low-bit LCG-ish
  *               regularity; |m·2654435761| < 2⁵³ at any realistic D)
  *   proj(t,h) = Σ_d w(t,h,d)·ei[d]        (exact int64, order-free)
  *   bucket[t] = Σ_h [proj(t,h) ≥ 0] · 2^h
  *
  * Why an expression and not HOFs: the nested transform/aggregate form
  * interprets a catalyst lambda per (table, bit, dim) — tables·bits·D ≈
  * 1.5k lambda frames per row — and materializes the weight arrays; this
  * is a tight static loop inside whole-stage codegen. Null or empty
  * embedding (or any null element) → null.
  */
object LshSignature {
  def lsh_buckets(c: Column, tables: Int, bits: Int): Column =
    GraftShim.column(LshBucketsExpr(GraftShim.expression(c), tables, bits))

  /** The fixed-point scale: ei = floor(x · 10⁴). Coarse enough that the
    * float→double widening is exact far below it, fine enough that sign
    * bits match the real projection except within 10⁻⁴·D of a hyperplane. */
  val Scale = 10000.0
}

case class LshBucketsExpr(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {
  require(tables >= 1 && bits >= 1 && bits <= 62,
    s"lsh_buckets needs 1 ≤ tables and 1 ≤ bits ≤ 62, got ($tables, $bits)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets needs an array<float|double> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    LshBucketsExpr.lshEval(input.asInstanceOf[ArrayData], isFloat, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.pipeline.LshBucketsExpr.lshEval(
         |  $c, $isFloat, $tables, $bits);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {

  /** null for an empty array or any null element, else the bucket array. */
  def lshEval(arr: ArrayData, isFloat: Boolean, tables: Int, bits: Int): ArrayData = {
    val d = arr.numElements()
    if (d == 0) return null
    val ei = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      ei(i) = math.floor(v * LshSignature.Scale).toLong
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var h = 0
      while (h < bits) {
        val base = (t.toLong * bits + h) * d
        var proj = 0L
        var j = 0
        while (j < d) {
          val x = ((base + j) * 2654435761L) % 4294967296L
          proj += (2L * ((x >> 16) & 1L) - 1L) * ei(j)
          j += 1
        }
        if (proj >= 0L) bucket |= 1L << h
        h += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
