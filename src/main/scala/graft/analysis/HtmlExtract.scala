package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML→text extraction over the `html` binary column.
  *
  * Contract (input_hint): extraction must reproduce the `text` column
  * byte-identically per url. The extractor is a single-pass scanner:
  * drop `<script>`/`<style>` subtrees and all tags, decode the five XML
  * entities, collapse inter-tag whitespace runs to one space, trim.
  * No DOM, no allocation beyond the output buffer — codegen-friendly and
  * ~GB/s per core, which is what matters when the html column is 100 TB.
  *
  * Reference analog: the reference consumes pre-extracted passages
  * (loaders.py:155-174 reads TSV text directly); our engine owns the
  * extraction stage because the input table carries raw WARC html.
  */
object HtmlExtract {
  def html_extract(c: Column): Column =
    GraftShim.column(HtmlExtractExpr(GraftShim.expression(c)))

  def extract(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val out = new java.lang.StringBuilder(s.length / 2)
    var i = 0
    val n = s.length
    var pendingSpace = false
    // case-INsensitive close-tag scan (open tags match case-insensitively
    // too — an uppercase </SCRIPT> must still close its subtree, or the
    // whole rest of the document is swallowed)
    def skipUntil(close: String): Int = {
      var j = i
      val last = n - close.length
      while (j <= last && !s.regionMatches(true, j, close, 0, close.length)) j += 1
      if (j > last) n else j + close.length
    }
    // a tag NAME must end at the match (boundary char) — '<styleguide>'
    // is not '<style>' and must not swallow text hunting for '</style>'
    def tagAt(name: String): Boolean =
      s.regionMatches(true, i + 1, name, 0, name.length) && {
        val after = i + 1 + name.length
        after >= n || s.charAt(after) == '>' || s.charAt(after) == ' ' ||
          s.charAt(after) == '\t' || s.charAt(after) == '\n' ||
          s.charAt(after) == '\r' || s.charAt(after) == '/'
      }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val script = tagAt("script")
        val style = tagAt("style")
        val head = tagAt("head")
        if (script) { i = skipUntil("</script>") }
        else if (style) { i = skipUntil("</style>") }
        else if (head) { i = skipUntil("</head>") }
        else {
          val end = s.indexOf('>', i)
          i = if (end < 0) n else end + 1
        }
        if (out.length > 0) pendingSpace = true
      } else if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 6) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp" => "&"; case "lt" => "<"; case "gt" => ">"
            case "quot" => "\""; case "apos" => "'"
            case _ => null
          }
          if (rep != null) {
            if (pendingSpace) { out.append(' '); pendingSpace = false }
            out.append(rep); i = semi + 1
          } else { if (pendingSpace) { out.append(' '); pendingSpace = false }; out.append(c); i += 1 }
        } else { if (pendingSpace) { out.append(' '); pendingSpace = false }; out.append(c); i += 1 }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (out.length > 0) pendingSpace = true
        i += 1
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  def eval(bytes: Array[Byte]): UTF8String = UTF8String.fromString(extract(bytes))
}

case class HtmlExtractExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_extract"
  override def nullSafeEval(input: Any): Any =
    HtmlExtract.eval(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.HtmlExtract.eval($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlExtractExpr =
    copy(child = newChild)
}
