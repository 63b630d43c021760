package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** `collect_list` with a HARD buffer cap: accumulates at most `limit + 1`
  * elements per group and silently drops the rest.
  *
  * Why: the dedup candidate generators cap bucket fanout with
  * `filter(size(ids) <= maxBucket)` — but a plain `collect_list` only
  * applies that cap AFTER materializing the whole group in the
  * aggregation buffer. At web scale that unbounded buffer is the real
  * hazard: one boilerplate shingle/band/simhash-chunk shared by 10^8
  * docs would accumulate a multi-GB array in a single reducer before
  * the filter throws it away (the reference never meets this because
  * its corpora are pre-deduped MS MARCO slices; our caps exist exactly
  * because Common-Crawl-style input is not).
  *
  * `limit + 1` keeps the downstream predicate exact: a group whose true
  * size exceeds the cap still surfaces with `size = limit + 1`, so
  * `size <= limit` drops it just as it would the fully-collected list,
  * while any SURVIVING group is complete (we only ever drop elements
  * past position limit + 1, and such groups are filtered out). Which
  * elements a dropped group retains is arbitrary — immaterial, they
  * never escape the filter.
  *
  * Runs as the same `ObjectHashAggregate` a `collect_list` uses (a
  * `TypedImperativeAggregate` via [[udaf]]), with map-side partial
  * buffers ALSO capped — a hot key costs every partition at most
  * `limit + 1` entries of memory and shuffle bytes.
  */
object BoundedCollect {

  private final class Longs(limit: Int)
      extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {
    private val cap = limit + 1
    override def zero: ArrayBuffer[Long] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] = {
      if (b.length < cap) b += x
      b
    }
    override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
      val take = math.min(b.length, cap - a.length)
      if (take > 0) a ++= b.view.slice(0, take)
      a
    }
    override def finish(b: ArrayBuffer[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
      Encoders.kryo[ArrayBuffer[Long]]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  private final class Longs3(limit: Int)
      extends Aggregator[(Long, Long, Long), ArrayBuffer[(Long, Long, Long)],
                         Seq[(Long, Long, Long)]] {
    private val cap = limit + 1
    override def zero: ArrayBuffer[(Long, Long, Long)] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[(Long, Long, Long)],
                        x: (Long, Long, Long)): ArrayBuffer[(Long, Long, Long)] = {
      if (b.length < cap) b += x
      b
    }
    override def merge(a: ArrayBuffer[(Long, Long, Long)],
                       b: ArrayBuffer[(Long, Long, Long)]): ArrayBuffer[(Long, Long, Long)] = {
      val take = math.min(b.length, cap - a.length)
      if (take > 0) a ++= b.view.slice(0, take)
      a
    }
    override def finish(b: ArrayBuffer[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      b.toSeq
    override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long, Long)]] =
      Encoders.kryo[ArrayBuffer[(Long, Long, Long)]]
    override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long, Long)]]()
  }

  /** Capped collect of a single long column → `array<bigint>`. */
  def longs(limit: Int): UserDefinedFunction =
    udaf(new Longs(limit), Encoders.scalaLong)

  /** Capped collect of three long columns → `array<struct<_1,_2,_3>>`
    * (callers rename the fields with a `transform`). */
  def longs3(limit: Int): UserDefinedFunction =
    udaf(new Longs3(limit), ExpressionEncoder[(Long, Long, Long)]())
}
