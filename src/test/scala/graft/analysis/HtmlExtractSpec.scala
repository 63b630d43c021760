package graft.analysis

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases for the single-pass HTML extractor (the byte-identity
  * contract's other half — BmEngineSpec checks extraction ≡ text on the
  * synthesized corpus; these pin the scanner's edge semantics). */
class HtmlExtractSpec extends AnyFunSuite {

  private def x(html: String): String = HtmlExtract.extract(html.getBytes(UTF_8))

  test("tags dropped, whitespace collapsed, trimmed") {
    assert(x("<html><body> <p>a  b</p>\n<div>c</div> </body></html>") == "a b c")
  }

  test("script/style/head subtrees removed entirely") {
    assert(x("<head><title>T</title></head><body>x</body>") == "x")
    assert(x("<p>a</p><script>var x = '<b>no</b>';</script><p>b</p>") == "a b")
    assert(x("<style>p { color: red }</style>hello") == "hello")
  }

  test("the five XML entities decode; unknown entities pass through") {
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == "a & b <c> \"d\" 'e'")
    assert(x("tom &copy; jerry") == "tom &copy; jerry")
    assert(x("5 & 6") == "5 & 6") // bare ampersand
  }

  test("uppercase close tags and prefix-named tags do not swallow the document") {
    // close-tag scan is case-insensitive (legacy pages use </SCRIPT>)
    assert(x("<SCRIPT>x</SCRIPT><p>body</p>") == "body")
    assert(x("<Style>p{}</STYLE>hello") == "hello")
    assert(x("<HEAD><title>T</title></Head>x") == "x")
    // a tag NAME must end at the match: <styleguide> is not <style>
    assert(x("<styleguide>a</styleguide> real") == "a real")
    assert(x("<scripted>b</scripted> text") == "b text")
    assert(x("<header>h</header>x") == "h x")
  }

  test("unterminated structures do not loop or throw") {
    assert(x("<p>a<script>never closed") == "a")
    assert(x("<p unclosed") == "")
    assert(x("") == "")
  }

  test("unicode survives byte-level processing") {
    assert(x("<p>héllo 世界</p>") == "héllo 世界")
  }
}
