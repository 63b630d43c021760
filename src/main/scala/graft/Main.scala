package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexUpdater}
import graft.query.{Bm25Search, RankingIO, SearchSession}
import graft.serving.SearchHttpServer

/** spark-submit entry point (north rule: "run via spark-submit on a
  * multi-executor cluster"). In cluster mode the session comes from
  * spark-submit's conf; standalone it falls back to local[*].
  *
  * Commands:
  *   index   --pages <parquet> --out <indexDir> [--no-audit]
  *           [--buckets <B>]  (hive-partition blocks by pmod(term_id, B)
  *                             for query-time directory pruning)
  *   search  --index <indexDir> --queries <tsv|parquet> --k <n> --out <dir>
  *   add     --index <indexDir> --pages <parquet>
  *   remove  --index <indexDir> --ids <comma-separated docIds>
  *   compact --index <indexDir> --out <dir> [--if-over <n>]
  *           (--if-over: only compact past n update segments — the
  *            scheduled-cadence form; prints SKIPPED otherwise)
  *   serve   --index <indexDir> [--port <p>]   (HTTP /api/search frontend)
  *   demo    [--docs <n>]   (synthesize, build, search, print top ranks)
  */
object Main {

  private def sparkSession(): SparkSession = {
    val b = SparkSession.builder().appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
    val s = (if (sys.env.contains("SPARK_MASTER") || sys.props.contains("spark.master")) b
             else b.master("local[*]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val BooleanFlags = Set("--no-audit")

  /** Left-to-right fold: boolean flags consume one token, --key value
    * flags consume two — position-independent (a fixed-stride sliding
    * window would mis-pair everything after an early boolean flag). */
  private def parseArgs(args: Seq[String]): Map[String, String] = {
    @annotation.tailrec
    def go(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case f :: tail if BooleanFlags(f) => go(tail, acc + (f.drop(2) -> "true"))
      case k :: v :: tail if k.startsWith("--") => go(tail, acc + (k.drop(2) -> v))
      case other :: _ => sys.error(s"unparseable argument: $other")
    }
    go(args.toList, Map.empty)
  }

  private def readQueries(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".tsv") || path.endsWith(".csv")) RankingIO.readQueriesTsv(spark, path)
    else spark.read.parquet(path)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <synth|index|search|add|remove|compact|serve|demo> [--opts]")
    val cmd = args.head
    val opts = parseArgs(args.tail.toSeq)
    val spark = sparkSession()

    cmd match {
      // deterministic Common-Crawl-style corpus + query set, for trying
      // the CLI end-to-end without external data (FIXTURES.md §1-2)
      case "synth" =>
        val n = opts.getOrElse("docs", "100000").toLong
        corpus.Synthesizer.pages(spark, n, spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(opts("out"))
        opts.get("queries-out").foreach { q =>
          corpus.Synthesizer.queries(spark, opts.getOrElse("queries", "100").toInt, n)
            .write.mode("overwrite").parquet(q)
        }
        println(s"[graft] synthesized $n pages -> ${opts("out")}")

      case "index" =>
        val reports = IndexBuilder.build(spark,
          spark.read.parquet(opts("pages")), opts("out"),
          graft.index.Bm25Params(termBuckets = opts.getOrElse("buckets", "0").toInt),
          auditExtraction = !opts.contains("no-audit"))
        reports.foreach(r => println(
          f"[graft] stage=${r.stage} rows=${r.rows} skipped=${r.skipped} sec=${r.seconds}%.1f snapshot=${r.snapshotId}%016x"))
        // north-rule per-partition throughput metrics: one JSONL line per
        // (stage, partition file) with rows/bytes from the committed
        // manifest lineage (parquet footers, no data rescan) and the
        // stage's wall time; rows_per_sec is the stage rate attributed to
        // the partition (null for resume-skipped stages, which did no
        // work this run). Written beside the stage dirs — inert to opens.
        val metricsPath = java.nio.file.Paths.get(opts("out"), "metrics.jsonl")
        val metricLines = reports.flatMap { r =>
          val m = graft.catalog.TableManifest.read(
            IndexBuilder.stageDir(opts("out"), r.stage))
          m.files.map { f =>
            val rate =
              if (r.skipped || r.seconds <= 0) "null"
              else f"${f.rows / r.seconds}%.1f"
            s"""{"stage":"${r.stage}","partition":"${f.path}","rows":${f.rows},""" +
              f""""bytes":${f.bytes},"stage_sec":${r.seconds}%.3f,""" +
              s""""skipped":${r.skipped},"rows_per_sec":$rate}"""
          }
        }
        java.nio.file.Files.write(metricsPath,
          String.join("\n", metricLines: _*).getBytes("UTF-8"))
        val docsReport = reports.find(_.stage == "docs")
        docsReport.filter(r => !r.skipped && r.seconds > 0).foreach(r =>
          println(f"[graft] throughput: ${r.rows / r.seconds}%.1f docs/sec (docs stage)"))
        println(s"[graft] per-partition metrics: $metricsPath (${metricLines.size} lines)")

      case "search" =>
        val index = IndexUpdater.openMerged(spark, opts("index"))
        val k = opts.getOrElse("k", "10").toInt
        val ranking = Bm25Search.searchPersisted(
          readQueries(spark, opts("queries")), index, k)
        RankingIO.writeRanking(ranking, opts("out"),
          Map("index" -> opts("index"), "k" -> k.toString))
        println(s"[graft] ranking written to ${opts("out")}")

      case "add" =>
        val seg = IndexUpdater.add(spark, opts("index"), spark.read.parquet(opts("pages")))
        println(s"[graft] segment added: $seg")

      case "remove" =>
        val ids = opts("ids").split(",").map(_.trim.toLong).toSeq
        IndexUpdater.remove(spark, opts("index"), ids)
        println(s"[graft] tombstoned ${ids.size} docIds")

      case "compact" =>
        opts.get("if-over").map(_.toInt) match {
          case Some(cap) =>
            if (IndexUpdater.compactIfNeeded(spark, opts("index"), opts("out"), cap))
              println(s"[graft] compacted into ${opts("out")} (segments > $cap)")
            else println(s"[graft] SKIPPED: segment count within $cap")
          case None =>
            IndexUpdater.compact(spark, opts("index"), opts("out"))
            println(s"[graft] compacted into ${opts("out")}")
        }

      case "serve" =>
        // the reference's server.py: one long-lived searcher behind HTTP
        // (server.py:19-44); here a warm SearchSession behind the JDK server
        val session = SearchSession.open(spark, opts("index"))
        val server = SearchHttpServer.start(session,
          port = opts.getOrElse("port", "8893").toInt)
        println(s"[graft] serving http://127.0.0.1:${server.port}/api/search?query=...&k=10")
        // periodic latency line (reference searcher.py:101-114 prints its
        // running mean/std); only when queries actually computed
        val reporter = new Thread(() => {
          while (true) {
            Thread.sleep(60000)
            val t = session.timing
            if (t.count > 0)
              println(f"[graft] served ${t.count} computed queries: " +
                f"mean ${t.meanSec * 1000}%.1f ms, std ${t.stdSec * 1000}%.1f ms")
          }
        })
        reporter.setDaemon(true)
        reporter.start()
        try Thread.currentThread().join() // serve until the JVM is killed
        finally { server.stop(); session.close() }

      case "demo" =>
        val n = opts.getOrElse("docs", "10000").toLong
        val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString
        IndexBuilder.build(spark, corpus.Synthesizer.pages(spark, n, 32), dir)
        val index = IndexBuilder.open(spark, dir)
        val queries = corpus.Synthesizer.queries(spark, 5, n)
        Bm25Search.searchPersisted(queries, index, 5)
          .join(spark.read.parquet(IndexBuilder.stageDir(dir, "docs"))
            .select(col("doc_id"), col("url")), "doc_id")
          .orderBy(col("qid"), col("rank"))
          .show(25, truncate = false)

      case other => sys.error(s"unknown command: $other")
    }
    spark.stop()
  }
}
