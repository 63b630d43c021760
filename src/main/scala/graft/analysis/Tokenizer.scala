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

  /** Tokens with character spans: (term, start, end) per token, end
    * exclusive, offsets in Java char units over the ORIGINAL text —
    * the reference's offset mapping for span labels
    * (colbert/modeling/tokenization/doc_tokenization.py:60-65,
    * utils.py:145-161). Slow path (String-based); used by span features,
    * not the index hot path. */
  def tokenizeWithOffsets(text: String, maxTerms: Int): Array[(String, Int, Int)] = {
    if (text == null) return null
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int, Int)](32)
    val sb = new java.lang.StringBuilder(16)
    var start = -1
    var i = 0
    val n = text.length
    while (i < n && out.length < maxTerms) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp) || Character.getType(cp) == Character.DECIMAL_DIGIT_NUMBER) {
        if (sb.length == 0) start = i
        sb.appendCodePoint(Character.toLowerCase(cp))
      } else if (sb.length > 0) {
        out += ((sb.toString, start, i))
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0 && out.length < maxTerms) out += ((sb.toString, start, i))
    out.toArray
  }

  def tokenize_with_offsets(c: Column, maxTerms: Int = DocMaxTerms): Column =
    GraftShim.column(TokenizeOffsetsExpr(GraftShim.expression(c), maxTerms))

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

/** text → array<struct<term:string, start:int, end:int>> (end exclusive,
  * char offsets into the original text). */
case class TokenizeOffsetsExpr(child: Expression, maxTerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("end", org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tokenize_with_offsets"
  override def nullSafeEval(input: Any): Any =
    TokenizeExpr.offsetsEval(input.asInstanceOf[UTF8String], maxTerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.TokenizeExpr.offsetsEval($c, $maxTerms)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeOffsetsExpr =
    copy(child = newChild)
}

object TokenizeExpr {

  def offsetsEval(s: UTF8String, maxTerms: Int): ArrayData = {
    val toks = Tokenizer.tokenizeWithOffsets(s.toString, maxTerms)
    new GenericArrayData(toks.map { case (t, st, en) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(t), st, en)).asInstanceOf[Any]
    })
  }

  /** Called from generated code; single pass over the raw UTF-8 bytes.
    *
    * The tokenizer is THE hot path of index build (hundreds of millions of
    * calls per corpus scan), so this avoids the String round-trip of the
    * reference implementation above: ASCII letters/digits are lowercased
    * byte-wise into a reusable buffer and emitted as UTF8String copies; any
    * token containing a non-ASCII lead byte falls back to the codepoint
    * scanner for exactly that token (identical semantics, property-tested
    * against [[Tokenizer.tokenize]]). Allocation per token: one byte[]
    * (inside UTF8String) — no UTF-16 decode, no intermediate String.
    */
  def tokenizeEval(s: UTF8String, maxTerms: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any](math.min(maxTerms, 32))
    var buf = new Array[Byte](32)
    var bl = 0        // current token length in buf
    var ascii = true  // current token is pure ASCII
    var i = 0
    def emit(): Unit = {
      if (bl > 0 && out.size < maxTerms) {
        if (ascii) {
          out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, bl)))
        } else {
          // rare path: the buffered segment may contain non-ASCII
          // separators/case — delegate the WHOLE segment to the codepoint
          // scanner and emit every token it produces
          val str = new String(buf, 0, bl, java.nio.charset.StandardCharsets.UTF_8)
          val toks = Tokenizer.tokenize(str, maxTerms - out.size)
          var t = 0
          while (t < toks.length) { out.add(UTF8String.fromString(toks(t))); t += 1 }
        }
      }
      bl = 0; ascii = true
    }
    while (i < n && out.size < maxTerms) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        val isUpper = b >= 'A' && b <= 'Z'
        val isAlnum = isUpper || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
        if (isAlnum) {
          if (bl == buf.length) buf = java.util.Arrays.copyOf(buf, bl * 2)
          buf(bl) = if (isUpper) (b + 32).toByte else b
          bl += 1
        } else emit()
        i += 1
      } else {
        // non-ASCII lead/continuation: copy the whole multi-byte sequence
        // into the token buffer; classification happens in the fallback
        var len = 1
        val u = b & 0xff
        if (u >= 0xF0) len = 4 else if (u >= 0xE0) len = 3 else if (u >= 0xC0) len = 2
        if (bl + len > buf.length) buf = java.util.Arrays.copyOf(buf, (bl + len) * 2)
        var j = 0
        while (j < len && i + j < n) { buf(bl + j) = bytes(i + j); j += 1 }
        bl += j
        ascii = false
        i += len
      }
    }
    emit()
    new GenericArrayData(out.toArray)
  }
}
