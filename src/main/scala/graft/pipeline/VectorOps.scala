package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd Σ aᵢ·bᵢ over two numeric arrays — the vector kernel of the
  * similarity family (SURVEY §2.11; reference analog: the MaxSim inner
  * products done by torch matmul, colbert/modeling/colbert.py:180-193).
  *
  * Bit-identical to the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0d, +)`):
  * elements cast to double, products accumulated in ascending index
  * order, null element or length mismatch → null (zip_with pads with
  * null and `acc + null` is null). The HOF version walks a catalyst
  * lambda interpreter per element and allocates the zipped array; this
  * is a tight static loop inside whole-stage codegen — ~10× on the IVF
  * assignment's N·k pair evaluations. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dotEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.pipeline.DotProductExpr.dotEval(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Called from generated code. Returns null on length mismatch or any
    * null element (HOF-equivalent semantics — see class doc). */
  def dotEval(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

object VectorOps {
  /** Column API: Σ aᵢ·bᵢ as double. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProductExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
