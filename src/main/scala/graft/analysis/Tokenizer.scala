package graft.analysis

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic lexical tokenizer shared by index build and query compile.
  *
  * Spec (fixed in the index manifest, mirrored by the DuckDB oracle SQL
  * `list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{Nd}]+'), ...)`):
  * lowercase per code point, split on runs of non-letter/non-digit code
  * points, drop empties, truncate to `maxTerms`.
  *
  * This replaces the reference's BERT WordPiece encode
  * (reference: colbert/modeling/tokenization/doc_tokenization.py:57-73,
  * query_tokenization.py:52-111) — the "encode" stage of the lexical
  * engine. Punctuation dropping mirrors the skiplist at
  * colbert/modeling/tokenization/utils.py:221-225; truncation mirrors
  * doc_maxlen=220 / query_maxlen=32 (infra/config/settings.py:133,139).
  */
object Tokenizer {
  val DocMaxTerms = 220
  val QueryMaxTerms = 32

  /** Code-point-level scan; single pass, no regex. Matches Unicode
    * classes L* and Nd (same classes as the oracle's RE2 \p{L}\p{Nd}). */
  def tokenize(text: String, maxTerms: Int): Array[String] = {
    if (text == null) return null
    val out = new scala.collection.mutable.ArrayBuffer[String](32)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n && out.length < maxTerms) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp) || Character.getType(cp) == Character.DECIMAL_DIGIT_NUMBER) {
        sb.appendCodePoint(Character.toLowerCase(cp))
      } else if (sb.length > 0) {
        out += sb.toString
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0 && out.length < maxTerms) out += sb.toString
    out.toArray
  }

  /** Column API: `tokenize(col, 220)` → array<string>. */
  def tokenize(c: Column, maxTerms: Int): Column =
    GraftShim.column(TokenizeExpr(GraftShim.expression(c), maxTerms))

  def tokenizeDoc(c: Column): Column = tokenize(c, DocMaxTerms)
  def tokenizeQuery(c: Column): Column = tokenize(c, QueryMaxTerms)
}

/** Catalyst expression wrapper — stays inside whole-stage codegen via a
  * static call (no Scala-UDF closure/serialization overhead). */
case class TokenizeExpr(child: Expression, maxTerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    TokenizeExpr.tokenizeEval(input.asInstanceOf[UTF8String], maxTerms)

  // NOTE: the static entry point must NOT be named `eval` — the class
  // inherits eval(InternalRow) from Expression, which suppresses scalac's
  // static forwarder for a companion method of the same name and makes
  // janino resolve the call to the wrong method (codegen falls back to
  // interpreted mode silently).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.TokenizeExpr.tokenizeEval($c, $maxTerms)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

object TokenizeExpr {
  /** Called from generated code; operates on UTF8String directly. */
  def tokenizeEval(s: UTF8String, maxTerms: Int): ArrayData = {
    val terms = Tokenizer.tokenize(s.toString, maxTerms)
    new GenericArrayData(terms.map(t => UTF8String.fromString(t).asInstanceOf[Any]))
  }
}
