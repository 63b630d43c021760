package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexBuilder, IndexUpdater}

/** Structured Streaming ingest: a stream of pages becomes incremental
  * index segments.
  *
  * The reference is batch-only (SURVEY §2.10); its closest mechanism is
  * the watch-loop + IndexUpdater (colbert/auto_inference.py,
  * colbert/index_updater.py). Here the same contract is expressed
  * Spark-natively: `readStream` (file source over the pages table, or any
  * source) → `foreachBatch` → one index SEGMENT per micro-batch, reusing
  * the batch IndexUpdater. Segments are named by batch id, so a batch
  * replayed after a crash overwrites ITS OWN segment — ingest is
  * idempotent and exactly-once at the segment level (checkpointLocation
  * gives at-least-once batch delivery; idempotent segment builds upgrade
  * it).
  *
  * Scale notes: each micro-batch runs the zero-shuffle postings build +
  * one blocks shuffle over ONLY the new docs; query-time merge cost grows
  * with segment count until `IndexUpdater.compact` folds them (run it on
  * a cadence, like the reference's persist_to_disk).
  */
object StreamingIngest {

  /** Start ingesting `pagesStream` (url, warc_ts, html, text, lang rows,
    * streaming DataFrame) into `indexDir` as per-batch segments. */
  def start(pagesStream: DataFrame, indexDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    pagesStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch.sparkSession, indexDir, batch, batchId)
      }
      .start()

  /** Build segment `seg-stream-<batchId>` from one micro-batch. Replays
    * overwrite the same segment with the same docIds (offset excludes the
    * segment itself), so the operation is idempotent. The segment is built
    * with the BASE index's params (same inheritance `IndexUpdater.add`
    * enforces — a default-params segment under a base with a different
    * blockSpan/termIdSeed/bucketing would break the merged reader); a
    * stream ingesting into an EMPTY dir (no base yet) uses the defaults. */
  def ingestBatch(spark: SparkSession, indexDir: String, batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val segName = f"seg-stream-$batchId%06d"
    val segDir = s"$indexDir/updates/$segName"
    val offset = IndexUpdater.maxDocId(spark, indexDir, excludeDir = Some(segDir)) + 1
    val params =
      if (graft.catalog.TableManifest.exists(IndexBuilder.stageDir(indexDir, "blocks")))
        IndexUpdater.paramsOf(indexDir)
      else graft.index.Bm25Params()
    IndexBuilder.build(spark, batch, segDir, params, docIdOffset = offset,
      auditExtraction = false)
  }

  /** Event-time crawl monitoring: docs per (host, 1-hour warc_ts window),
    * late data beyond the watermark dropped — the standard
    * watermark+window streaming aggregation over the pages stream. */
  def crawlStats(pagesStream: DataFrame, watermark: String = "2 hours"): DataFrame =
    pagesStream
      // no trailing "/": a path-less url ("https://example.com") must
      // still bucket under its host, not under ""
      .withColumn("host", regexp_extract(col("url"), "https?://([^/]+)", 1))
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), "1 hour"), col("host"))
      .agg(count(lit(1)).as("n_pages"), sum(length(col("text"))).as("n_chars"))
      .select(
        col("window.start").as("window_start"),
        col("host"), col("n_pages"), col("n_chars"))
}
