package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and make the Spark-side contract
  * (schema, partitioning, batch shape, frame fan-out) real while the
  * actual codec is STUBBED — no image/audio libraries ship in this
  * environment, so `fakeDecodeMeta` derives deterministic pseudo-metadata
  * from the byte stream itself (pure arithmetic, reproducible in the
  * oracle). Swapping in a real decoder changes ONE projection, none of the
  * plan shape.
  *
  * Scale notes: metadata extraction is a narrow scan-speed projection;
  * frame sampling is a bounded explode (≤ maxFrames rows/asset); byte
  * histograms/entropy run per-row with no shuffle. Real decode at 100 TB
  * would sit behind the same projections, partitioned by asset size so one
  * 4 GB video does not straggle a task — `sizeBucket` is that key.
  */
object Media {

  /** STUB DECODE: (n_bytes, format, width, height, n_frames, size_bucket)
    * from the payload — deterministic fake metadata standing in for a real
    * header parse (magic bytes → format, dims); see object doc. */
  def mediaMeta(assets: DataFrame, payload: String = "payload"): DataFrame = {
    val nb = length(col(payload)).cast("long")
    assets.select(
      col("asset_id"),
      nb.as("n_bytes"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
        (nb % 4 + 1).cast("int")).as("format"),
      (nb % 640 + 16).cast("int").as("width"),
      ((nb * 31) % 480 + 16).cast("int").as("height"),
      (nb % 16 + 1).cast("int").as("n_frames"),
      floor(log2(greatest(nb, lit(2)))).cast("int").as("size_bucket"))
  }

  /** Frame sampling fan-out: ≤ maxFrames evenly spaced (frame_no,
    * byte_offset) rows per asset — the batch shape a real video decoder
    * feeds downstream. Bounded explode: skew-safe by construction. */
  def sampleFrames(assets: DataFrame, maxFrames: Int = 4, payload: String = "payload"): DataFrame = {
    val meta = mediaMeta(assets, payload)
    meta.select(
      col("asset_id"), col("n_bytes"), col("n_frames"),
      explode(sequence(lit(0), least(col("n_frames"), lit(maxFrames)) - 1)).as("frame_no"))
      .select(
        col("asset_id"),
        col("frame_no"),
        // floor over double (exact < 2^53) — portable integer semantics
        floor(col("frame_no") * col("n_bytes").cast("double") / col("n_frames"))
          .cast("long").as("byte_offset"))
  }

  /** STUB RESIZE: the Spark-side plumbing of an image/frame resize —
    * per asset, the source dims (from [[mediaMeta]]'s stub decode), the
    * target dims, the exact scale factors a resampler would apply, and
    * the resized payload's byte budget (target_w·target_h·3, the RGB
    * plane a real kernel would emit). The pixel kernel itself is the
    * stubbed step (no image libs in this environment); swapping in a
    * real one replaces the byte-budget column with the actual resized
    * bytes and changes nothing else in the plan — a narrow map-phase
    * projection at any scale. */
  def resizeStub(assets: DataFrame, targetW: Int = 224, targetH: Int = 224,
                 payload: String = "payload"): DataFrame =
    mediaMeta(assets, payload).select(
      col("asset_id"),
      col("width"), col("height"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      round(lit(targetW).cast("double") / col("width"), 6).as("scale_x"),
      round(lit(targetH).cast("double") / col("height"), 6).as("scale_y"),
      lit(targetW.toLong * targetH * 3).as("resized_n_bytes"))

  /** Byte histogram features (REAL, not stubbed): shannon entropy and
    * top-byte frequency over the payload — the cheap corruption/encoding
    * screen a media pipeline runs before decode. Custom codegen'd
    * expression: one pass over the bytes, no UDF boundary. */
  def byteStats(c: Column): Column = GraftShim.column(ByteStatsExpr(GraftShim.expression(c)))

  def byteStatsDf(assets: DataFrame, payload: String = "payload"): DataFrame =
    assets.select(
      col("asset_id"),
      byteStats(col(payload)).getItem(0).as("entropy"),
      byteStats(col(payload)).getItem(1).as("top_byte_freq"))
}

/** binary → array<double>(2): [shannon entropy (bits/byte), max byte
  * frequency]. */
case class ByteStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_stats"
  override def nullSafeEval(input: Any): Any =
    ByteStatsExpr.byteStatsEval(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.multimodal.ByteStatsExpr.byteStatsEval($c)")
  override protected def withNewChildInternal(newChild: Expression): ByteStatsExpr =
    copy(child = newChild)
}

object ByteStatsExpr {
  def byteStatsEval(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    var entropy = 0.0
    var maxC = 0L
    var j = 0
    while (j < 256) {
      val c = counts(j)
      if (c > 0) {
        val p = c / n
        entropy -= p * (StrictMath.log(p) / StrictMath.log(2.0))
        if (c > maxC) maxC = c
      }
      j += 1
    }
    new GenericArrayData(Array[Any](entropy, maxC / n))
  }
}
