package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.analysis.{HtmlExtractExpr, TermCountsExpr, TokenizeExpr, TokenizeOffsetsExpr, Tokenizer}
import graft.codec.{BlockEncodeExpr, DeltaVarintDecode, DeltaVarintEncode, VarintDecodeInts, VarintEncodeInts}
import graft.multimodal.ByteStatsExpr

/** SQL registration of the engine's custom Catalyst expressions — usable
  * from `spark.sql(...)` exactly like built-ins (SURVEY §2.11: each
  * expression is exposed in both the Column API and SQL). Register
  * per-session with [[GraftFunctions.register]], or cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions` on spark-submit.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(s"$what must be a numeric literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokenize" -> {
      case Seq(c) => TokenizeExpr(c, Tokenizer.DocMaxTerms)
      case Seq(c, m) => TokenizeExpr(c, intArg(m, "maxTerms"))
      case _ => throw new IllegalArgumentException("graft_tokenize(text[, maxTerms])")
    },
    "graft_tokenize_offsets" -> {
      case Seq(c) => TokenizeOffsetsExpr(c, Tokenizer.DocMaxTerms)
      case Seq(c, m) => TokenizeOffsetsExpr(c, intArg(m, "maxTerms"))
      case _ => throw new IllegalArgumentException("graft_tokenize_offsets(text[, maxTerms])")
    },
    "graft_html_extract" -> {
      case Seq(c) => HtmlExtractExpr(c)
      case _ => throw new IllegalArgumentException("graft_html_extract(html)")
    },
    "graft_term_counts" -> {
      case Seq(c) => TermCountsExpr(c)
      case _ => throw new IllegalArgumentException("graft_term_counts(tokens)")
    },
    "graft_delta_varint_encode" -> { case Seq(c) => DeltaVarintEncode(c) },
    "graft_delta_varint_decode" -> { case Seq(c) => DeltaVarintDecode(c) },
    "graft_varint_encode" -> { case Seq(c) => VarintEncodeInts(c) },
    "graft_varint_decode" -> { case Seq(c) => VarintDecodeInts(c) },
    "graft_byte_stats" -> { case Seq(c) => ByteStatsExpr(c) },
    "graft_lsh_buckets" -> {
      case Seq(c, t, b) =>
        graft.pipeline.LshBucketsExpr(c, intArg(t, "tables"), intArg(b, "bits"))
      case _ => throw new IllegalArgumentException("graft_lsh_buckets(embedding, tables, bits)")
    },
    "graft_block_encode" -> {
      case Seq(entries, avgdl, k1, b) =>
        BlockEncodeExpr(entries, avgdl, doubleArg(k1, "k1"), doubleArg(b, "b"))
      case _ => throw new IllegalArgumentException("graft_block_encode(entries, avgdl, k1, b)")
    })

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** spark-submit extension hook:
  * `--conf spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
