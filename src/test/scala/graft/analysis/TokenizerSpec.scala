package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden tokenization cases — analog of the reference's golden token-id
  * vectors (colbert/tests/tokenizers_test.py:89-135). */
class TokenizerSpec extends AnyFunSuite {

  private def tok(s: String, max: Int = 220): Seq[String] =
    Tokenizer.tokenize(s, max).toSeq

  test("basic lowercase + split") {
    assert(tok("Hello, World!") == Seq("hello", "world"))
  }

  test("digits kept, punctuation runs collapsed") {
    assert(tok("foo42--bar,,baz 7") == Seq("foo42", "bar", "baz", "7"))
  }

  test("unicode letters kept, per-codepoint lowercase") {
    assert(tok("Héllo 世界 ÇA") == Seq("héllo", "世界", "ça"))
  }

  test("empty and all-punct") {
    assert(tok("") == Seq())
    assert(tok("!!! ... ???") == Seq())
  }

  test("leading/trailing separators") {
    assert(tok("  -x- ") == Seq("x"))
  }

  test("truncation at maxTerms") {
    val long = (1 to 300).map(i => s"t$i").mkString(" ")
    val got = tok(long)
    assert(got.length == 220 && got.head == "t1" && got.last == "t220")
  }

  test("query truncation at 32") {
    val long = (1 to 50).map(i => s"t$i").mkString(" ")
    assert(tok(long, Tokenizer.QueryMaxTerms).length == 32)
  }

  test("tab/newline separators (reference TSV strip semantics)") {
    assert(tok("a\tb\nc\r\nd") == Seq("a", "b", "c", "d"))
  }

  test("byte-path eval ≡ codepoint tokenize on adversarial unicode strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      "Hello, World!", "", "foo42--bar", "Héllo 世界 ÇA", "a—b", "x·y·z",
      "ͶΣΜIXED ÅΒΓ", "🙂 emoji🙂mixed", "tail—", "—lead", "é", "…", "Ａｂｃ１２３",
      "ácombining", "ÄÖÜ äöü ß", "кириллица ЛАТ", "﷽", "a­b",
      (1 to 500).map(_ => "Wörd").mkString("·"))
    cases.foreach { c =>
      val fast = TokenizeExpr.tokenizeEval(UTF8String.fromString(c), 220)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val slow = Tokenizer.tokenize(c, 220).toSeq
      assert(fast == slow, s"input <$c>")
    }
    // randomized sweep
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val len = rnd.nextInt(60)
      val c = new String((0 until len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => (rnd.nextInt(26) + 'A').toChar
          case 1 => (rnd.nextInt(26) + 'a').toChar
          case 2 => "—·,!。ÉΩб世 \t".charAt(rnd.nextInt(10))
          case 3 => (rnd.nextInt(10) + '0').toChar
          case _ => rnd.nextPrintableChar()
        }
      }.toArray)
      val fast = TokenizeExpr.tokenizeEval(UTF8String.fromString(c), 16)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val slow = Tokenizer.tokenize(c, 16).toSeq
      assert(fast == slow, s"input <$c>")
    }
  }

  test("expression path == function path") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq("Hello, World!", "", "foo42--bar", "Héllo 世界")
    val got = rows.toDF("text")
      .select(Tokenizer.tokenizeDoc(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == rows.map(tok(_)))
  }
}
