package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synthesizer
import graft.index.{IndexBuilder, IndexUpdater}
import graft.query.Bm25Search

/** Streaming ingest: micro-batches become idempotent index segments;
  * merged search over streamed docs equals a batch build over the same
  * corpus. Plus the watermark+window crawl-stats aggregation. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  type Page = (String, Timestamp, Array[Byte], String, String)

  /** urls embed the docId as the last path segment; url ORDER is by host,
    * so id-range filters must parse the suffix. */
  private def idOf(url: String): Long = url.split("/").last.toLong

  test("streamed micro-batches build segments; merged search ≡ batch build") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // base: docs 0..149 built batch
    val base = Synthesizer.pages(spark, 150, 3)
    IndexBuilder.build(spark, base, dir, auditExtraction = false)

    // stream: docs 150..249 arrive in 2 micro-batches
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Page]
    val q = StreamingIngest.start(
      stream.toDF().toDF("url", "warc_ts", "html", "text", "lang"),
      dir, Files.createTempDirectory("graft-ckpt").toString,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
    val all = Synthesizer.pages(spark, 250, 3).as[Page].collect().toSeq
    val tail = all.filter(p => idOf(p._1) >= 150)
    val (b1, b2) = tail.splitAt(tail.size / 2)
    stream.addData(b1: _*)
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    assert(IndexUpdater.segmentDirs(dir).size >= 1)

    val queries = Synthesizer.queries(spark, 15, 250)
    val merged = IndexUpdater.openMerged(spark, dir)
    val got = Bm25Search.searchFull(queries, merged, 10)

    val freshDir = Files.createTempDirectory("graft-streamfresh").toString
    IndexBuilder.build(spark, Synthesizer.pages(spark, 250, 3), freshDir,
      auditExtraction = false)
    val want = Bm25Search.searchFull(queries, IndexBuilder.open(spark, freshDir), 10)

    def byUrl(res: org.apache.spark.sql.DataFrame, d: String, seg: Boolean) = {
      val docs = (if (seg) (d +: IndexUpdater.segmentDirs(d)) else Seq(d))
        .map(x => spark.read.parquet(IndexBuilder.stageDir(x, "docs")))
        .reduce(_ unionByName _)
      res.join(docs.select(col("doc_id"), col("url")), "doc_id")
        .select(col("qid"), col("url"), col("score"))
        .as[(Long, String, Double)].collect().toSet
    }
    assert(byUrl(got, dir, seg = true) == byUrl(want, freshDir, seg = false))
  }

  test("replaying a batch overwrites its own segment (idempotent ingest)") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    IndexBuilder.build(spark, Synthesizer.pages(spark, 60, 2), dir, auditExtraction = false)
    val batch = Synthesizer.pages(spark, 80, 2)
      .filter(expr("cast(substring_index(url, '/', -1) as long) >= 60"))
    StreamingIngest.ingestBatch(spark, dir, batch, 7L)
    val first = spark.read.parquet(s"$dir/updates/seg-stream-000007/docs")
      .select(col("doc_id"), col("url")).as[(Long, String)].collect().toSet
    StreamingIngest.ingestBatch(spark, dir, batch, 7L) // replay
    assert(IndexUpdater.segmentDirs(dir).size == 1)
    val second = spark.read.parquet(s"$dir/updates/seg-stream-000007/docs")
      .select(col("doc_id"), col("url")).as[(Long, String)].collect().toSet
    assert(second == first, "replay must reproduce identical docIds")
  }

  test("streamed segments inherit the base index's non-default params") {
    val dir = Files.createTempDirectory("graft-stream-p").toString
    val p = graft.index.Bm25Params(blockSpan = 64)
    IndexBuilder.build(spark, Synthesizer.pages(spark, 50, 2), dir, p,
      auditExtraction = false)
    StreamingIngest.ingestBatch(spark, dir,
      Synthesizer.pages(spark, 30, 2, seed = 7L)
        .withColumn("url", regexp_replace(col("url"), "example/", "example/s/")),
      batchId = 0L)
    val seg = IndexUpdater.segmentDirs(dir).head
    assert(IndexUpdater.paramsOf(seg) == p,
      s"segment params ${IndexUpdater.paramsOf(seg)} != base $p")
  }

  test("crawl stats: event-time windows aggregate per host; watermark drops late rows") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Page]
    val out = StreamingIngest.crawlStats(
      stream.toDF().toDF("url", "warc_ts", "html", "text", "lang"), "1 hour")
    val q = out.writeStream.format("memory").queryName("crawl_stats")
      .outputMode("append").start()

    def page(host: String, tsMin: Long): Page =
      (s"https://$host/p/$tsMin", new Timestamp(tsMin * 60000L), Array[Byte](), "x y z", "en")
    stream.addData(page("a.com", 10), page("a.com", 20), page("b.com", 30))
    q.processAllAvailable()
    // advance event time far beyond watermark, then a LATE row for the old window
    stream.addData(page("a.com", 600))
    q.processAllAvailable()
    stream.addData(page("a.com", 11)) // late: watermark has passed min 600-60
    q.processAllAvailable()
    stream.addData(page("a.com", 1200)) // push watermark → finalize windows
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("crawl_stats")
      .select(col("host"), col("n_pages")).as[(String, Long)].collect().toSeq
    // first-hour window for a.com must contain exactly the 2 on-time pages
    assert(rows.contains(("a.com", 2L)), rows.toString)
    assert(rows.contains(("b.com", 1L)), rows.toString)
  }
}
