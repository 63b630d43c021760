package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** array<string> doc tokens → 64-char '0'/'1' SimHash signature as ONE
  * scalar pass (the same map-phase fusion as [[MinhashSignature]]):
  * per distinct term compute tf in a local map, derive its 64 hex digits
  * h = md5(term) ++ md5("s|" ++ term), and accumulate per position
  * w_j += tf · (hexval(h_j) + 1 − 8.5); bit_j = w_j > 0.
  *
  * Engine-portable semantics: identical to the declarative
  * tf × (instr('0123456789abcdef', substr(h, j, 1)) − 8.5) sum the DuckDB
  * oracle computes. All weights are odd multiples of 0.5 scaled by
  * integer tf, so the accumulation is EXACT in binary floating point —
  * here it runs in integer half-units (2·digit − 15), making the sign
  * decision order-independent and engine-independent by construction.
  *
  * Why an expression: the declarative form explodes |doc,term| × 64 rows
  * through two hash aggregations; fusing removes both shuffles and the
  * 64× row blow-up (measured ~4× on the sf0.1 sweep). NULL for an empty
  * token array (such docs have no terms and drop out of the relational
  * pipeline upstream).
  */
object SimhashSignature {
  def simhash_bits(c: Column): Column =
    GraftShim.column(SimhashBitsExpr(GraftShim.expression(c)))
}

case class SimhashBitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_bits"
  override def nullSafeEval(input: Any): Any =
    SimhashBitsExpr.simhashEval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.pipeline.SimhashBitsExpr.simhashEval($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SimhashBitsExpr =
    copy(child = newChild)
}

object SimhashBitsExpr {

  /** null for an empty token array, else the 64-bit signature string. */
  def simhashEval(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    if (n == 0) return null
    // local tf map (≤220 tokens — doc-local, like TermCountsExpr)
    val tf = new java.util.HashMap[UTF8String, Int](64)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      tf.put(t, tf.getOrDefault(t, 0) + 1)
      i += 1
    }
    val md = Md5Scratch.get()
    // integer half-units: digit value d contributes (d + 1 − 8.5) = (2d − 15)/2
    val w = new Array[Long](64)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      val cnt = e.getValue.toLong
      md.reset()
      md.update(bytes)
      val d1 = md.digest()
      md.reset()
      md.update('s'.toByte); md.update('|'.toByte)
      md.update(bytes)
      val d2 = md.digest()
      var j = 0
      while (j < 16) {
        val b1 = d1(j) & 0xff
        w(j * 2) += cnt * (2L * (b1 >>> 4) - 15)
        w(j * 2 + 1) += cnt * (2L * (b1 & 0xf) - 15)
        val b2 = d2(j) & 0xff
        w(32 + j * 2) += cnt * (2L * (b2 >>> 4) - 15)
        w(32 + j * 2 + 1) += cnt * (2L * (b2 & 0xf) - 15)
        j += 1
      }
    }
    val bits = new Array[Byte](64)
    var j = 0
    while (j < 64) { bits(j) = if (w(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(bits)
  }
}
