package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** docs→passages segmentation — sliding token windows with overlap
  * (reference: utility/preprocess/docs2passages.py:19-53: N-word windows,
  * configurable overlap). Pure array HOFs: embarrassingly parallel, no
  * shuffle; the fan-out is bounded by ceil(dl/stride) rows per doc. Used
  * to passage-ize long pages before indexing (reference indexes passages,
  * not whole documents). */
object Passages {

  /** Window starts 1, 1+stride, 1+2·stride, … (1-based), last window may
    * be shorter; a doc shorter than `window` yields ONE passage. */
  def passageStarts(toks: Column, window: Int, stride: Int): Column =
    when(size(toks) <= window, array(lit(1)))
      .otherwise(transform(
        sequence(lit(0), floor((size(toks) - window + stride - 1) / stride).cast("int")),
        i => i * stride + 1))

  /** (doc_id, passage_no, passage_text, n_tokens). */
  def segment(docs: DataFrame, window: Int = 64, overlap: Int = 32): DataFrame = {
    require(overlap < window, "overlap must be < window")
    val stride = window - overlap
    val toks = Tokenizer.tokenizeDoc(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(passageStarts(col("toks"), window, stride)).as(Seq("passage_no", "start")))
      .select(
        col("doc_id"),
        col("passage_no"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(window))).as("passage_text"),
        least(size(col("toks")) - col("start") + 1, lit(window)).cast("int").as("n_tokens"))
  }
}
