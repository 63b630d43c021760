package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.corpus.Synthesizer
import graft.index.{Bm25Params, IndexBuilder}
import graft.query.{Bm25IndexTables, Bm25Search}

/** Diagnostic: the bucketed blocks layout in its winning regime.
  *
  * `BucketProbe [nPages] [vocab] [buckets]` (defaults 2000000 1000000 64)
  * builds the SAME synthesized web-vocab corpus twice — flat layout and
  * `Bm25Params(termBuckets = buckets)` — and probes both with the same
  * query batch, reporting per path:
  *
  *   PROBEPATH <flat|bucketed> wall_ms=<min-of-3 warm> files=<numFiles>
  *     bytes=<filesSize> blocks=<probed block rows>
  *
  * `files` is the FileSourceScanExec numFiles metric — how many parquet
  * files the probe actually opened (= footers fetched). The flat layout
  * must open EVERY file of the blocks table just to consult row-group
  * stats; the bucketed layout lists only the probed term-hash
  * directories, so files ≈ (probed buckets / total buckets) × files.
  * At a 100 TB table (10^5–10^6 files) that metadata fan-out, not the
  * row decode, is what the partition pruning deletes. Local wall times
  * at this scale are near-identical by design — the decode volume is the
  * same; only the metadata cost shrinks, and locally footers are
  * page-cached. Results quoted in SCALE.md §layout.
  */
object BucketProbe {

  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files => F, Paths}
    val p = Paths.get(path)
    if (F.exists(p)) {
      import scala.jdk.CollectionConverters._
      F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(2000000L)
    val vocab = if (args.length > 1) args(1).toInt else 1000000
    val buckets = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bucket-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pagesDir = Files.createTempDirectory("graft-bprobe-pages").toString
    val flatDir = Files.createTempDirectory("graft-bprobe-flat").toString
    val bktDir = Files.createTempDirectory("graft-bprobe-bkt").toString
    try {
      Synthesizer.pages(spark, nPages, 128, vocab = vocab)
        .write.mode("overwrite").parquet(pagesDir)
      val src = spark.read.parquet(pagesDir)
      IndexBuilder.build(spark, src, flatDir, auditExtraction = false)
      IndexBuilder.build(spark, src, bktDir,
        Bm25Params(termBuckets = buckets), auditExtraction = false)

      val batch = Synthesizer.queries(spark, 10, nPages, vocab = vocab)
      import spark.implicits._
      // the serving shape: ONE query, two terms → at most 2 of `buckets`
      // term-hash dirs survive the partition filter
      val single = Seq((0L, "plant3 w17")).toDF("qid", "text")
      def probe(tag: String, queries: org.apache.spark.sql.DataFrame,
                index: Bm25IndexTables): Unit = {
        // warm + min-of-5 full-query wall (the end-to-end cost)
        Bm25Search.searchPersisted(queries, index, 10).count()
        val wall = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          Bm25Search.searchPersisted(queries, index, 10).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        // the probe scan itself, with its OWN QueryExecution so the scan
        // node's metrics (numFiles = footers opened) are attributable
        val qterms = Bm25Search.compileQueriesLocal(queries, index.termStats)
        val ids = qterms.select(col("term_id")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val probed = index.probeBlocks(ids)
        val nBlocks = probed.queryExecution.toRdd.count()
        val scans = probed.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        val files = scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(-1L)).sum
        val bytes = scans.map(_.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
        println(f"PROBEPATH $tag wall_ms=${wall * 1000}%.0f files=$files " +
          f"bytes=$bytes blocks=$nBlocks terms=${ids.size}")
      }
      val flat = IndexBuilder.open(spark, flatDir)
      val bkt = IndexBuilder.open(spark, bktDir)
      probe("flat-batch10", batch, flat)
      probe("bucketed-batch10", batch, bkt)
      probe("flat-single", single, flat)
      probe("bucketed-single", single, bkt)
    } finally {
      spark.stop()
      Seq(pagesDir, flatDir, bktDir).foreach(deleteRecursively)
    }
  }
}
