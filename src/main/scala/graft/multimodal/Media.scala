package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

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

  /** The stub decode's dimension contract, shared by [[mediaMeta]] and
    * [[resize]] (and replayed by the DuckDB oracles): one definition so
    * the two operators can never disagree on an asset's plane shape. */
  private def stubDims(payload: String): (Column, Column, Column) = {
    val nb = length(col(payload)).cast("long")
    (nb, (nb % 640 + 16).cast("int"), ((nb * 31) % 480 + 16).cast("int"))
  }

  /** STUB DECODE: (n_bytes, format, width, height, n_frames, size_bucket)
    * from the payload — deterministic fake metadata standing in for a real
    * header parse (magic bytes → format, dims); see object doc. */
  def mediaMeta(assets: DataFrame, payload: String = "payload"): DataFrame = {
    val (nb, w, h) = stubDims(payload)
    assets.select(
      col("asset_id"),
      nb.as("n_bytes"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
        (nb % 4 + 1).cast("int")).as("format"),
      w.as("width"),
      h.as("height"),
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

  /** REAL RESIZE KERNEL: nearest-neighbor resample of each asset's pixel
    * plane to (targetW × targetH), as a one-pass codegen'd expression —
    * the map-phase shape a real image-resize stage has at any scale
    * (narrow projection, no shuffle, partitioned upstream by asset size).
    *
    * Only the DECODE remains synthetic (no image codecs ship in this
    * environment): the source plane is the payload bytes read row-major
    * at the [[mediaMeta]] stub dims, wrapping when the payload is
    * shorter than width·height — a deterministic single-channel image
    * the oracle reproduces independently. The resample arithmetic
    * (`src_row = ⌊r·h/th⌋`, `src_col = ⌊c·w/tw⌋`) is exactly what a real
    * kernel applies per channel; swapping in a real decoder changes the
    * plane construction, none of the resample or the plan. */
  def resize(assets: DataFrame, targetW: Int = 224, targetH: Int = 224,
             payload: String = "payload"): DataFrame = {
    val (_, w, h) = stubDims(payload)
    assets.select(
      col("asset_id"),
      w.as("width"), h.as("height"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      round(lit(targetW).cast("double") / w, 6).as("scale_x"),
      round(lit(targetH).cast("double") / h, 6).as("scale_y"),
      resized(col(payload), w, h, targetW, targetH).as("resized"))
  }

  /** The resample column itself: binary in, (targetW·targetH)-byte
    * single-channel plane out. */
  def resized(payload: Column, srcW: Column, srcH: Column,
              targetW: Int, targetH: Int): Column =
    GraftShim.column(ResizeExpr(GraftShim.expression(payload),
      GraftShim.expression(srcW), GraftShim.expression(srcH), targetW, targetH))

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

/** (payload binary, src_w, src_h) → binary of targetW·targetH bytes:
  * nearest-neighbor resample of the payload read as a row-major
  * src_w×src_h single-channel plane (wrapping modulo payload length —
  * the synthetic stand-in for a decoded frame). Codegen'd: one JVM call
  * per row inside WholeStageCodegen, no UDF boundary. */
case class ResizeExpr(payload: Expression, srcW: Expression, srcH: Expression,
                      targetW: Int, targetH: Int) extends TernaryExpression {
  require(targetW > 0 && targetH > 0, s"bad target dims $targetW x $targetH")
  override def first: Expression = payload
  override def second: Expression = srcW
  override def third: Expression = srcH
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "media_resize"
  override def nullSafeEval(p: Any, w: Any, h: Any): Any =
    ResizeExpr.resizeEval(p.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int], targetW, targetH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, w, h) =>
      s"graft.multimodal.ResizeExpr.resizeEval($p, $w, $h, $targetW, $targetH)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ResizeExpr =
    copy(payload = newFirst, srcW = newSecond, srcH = newThird)
}

object ResizeExpr {
  def resizeEval(payload: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    if (payload.length == 0 || w <= 0 || h <= 0) return out
    val n = payload.length
    var r = 0
    while (r < th) {
      // long intermediates: w·h can exceed Int.MaxValue for a real 4K frame
      val srcRowBase = (r.toLong * h / th) * w
      val outBase = r * tw
      var c = 0
      while (c < tw) {
        val srcIdx = srcRowBase + c.toLong * w / tw
        out(outBase + c) = payload((srcIdx % n).toInt)
        c += 1
      }
      r += 1
    }
    out
  }
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
