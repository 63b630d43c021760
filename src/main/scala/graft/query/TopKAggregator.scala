package graft.query

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k heap as a typed Aggregator: Spark's partial/final
  * aggregation contract makes the per-partition heaps merge associatively —
  * the distributed re-expression of the reference's pthread-sharded heaps
  * in filter_pids.cpp:27-123 and the final `scores.sort` + slice in
  * colbert/search/index_storage.py:106-107.
  *
  * Order: score DESC, doc_id ASC tiebreak (reference stable-sort semantics,
  * server.py:34). The buffer is a plain Array kept heap-shaped lazily: we
  * append until 2k then compact to the best k, so reduce stays O(1)
  * amortized and the serialized partial buffer stays ≤ 2k entries.
  */
object TopKAggregator {

  type Entry = (Long, Double) // (doc_id, score)

  private def better(a: Entry, b: Entry): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  case class Buf(var k: Int, var entries: Array[Entry])

  private def compact(b: Buf): Buf = {
    if (b.entries.length > b.k) {
      b.entries = b.entries.sortWith(better).take(b.k)
    }
    b
  }

  class TopK(k: Int) extends Aggregator[Entry, Buf, Array[Entry]] {
    override def zero: Buf = Buf(k, Array.empty)
    override def reduce(b: Buf, e: Entry): Buf = {
      b.entries = b.entries :+ e
      if (b.entries.length >= 2 * k) compact(b) else b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      a.entries = a.entries ++ b.entries
      compact(a)
    }
    override def finish(b: Buf): Array[Entry] =
      b.entries.sortWith(better).take(k)
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Entry]]()
  }

  /** (qid, doc_id, score) → (qid, doc_id, rank, score): top-k per qid with
    * map-side partial heaps (no global per-qid sort shuffle). */
  def topK(scores: DataFrame, k: Int): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    val ds = scores.select(col("qid").cast("long"), col("doc_id").cast("long"),
      col("score").cast("double")).as[(Long, Long, Double)]
    val agg = new TopK(k).toColumn
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .toDF("qid", "top")
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(
        col("qid"),
        col("e._1").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("e._2").as("score"))
  }
}
