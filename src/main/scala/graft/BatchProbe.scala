package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

/** Stage breakdown of the scaling bench's 40-query batch over a persisted
  * 1M-doc index — where do the ~6.7 s go at local[32]?
  * `runMain graft.BatchProbe` with PROBE_DOCS / PROBE_CPUS / PROBE_INDEX
  * (reuse an index dir across runs to skip the build).
  */
object BatchProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("PROBE_INDEX", {
      val d = Files.createTempDirectory("batch-probe-index").toString
      println(s"building index at $d")
      IndexBuilder.build(spark, Synthesizer.pages(spark, n, 128), d, auditExtraction = false)
      d
    })
    val index = IndexBuilder.open(spark, dir)
    val queries = Synthesizer.queries(spark, 40, n)

    def time[T](label: String)(f: => T): T = {
      // warm + 2 measured
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"BATCHPROBE $label min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      null.asInstanceOf[T]
    }

    // decode volume of the probed terms
    val rows = Bm25Search.tokenizeQueriesDriver(queries)
    val dict = Bm25Search.lookupTerms(rows.map(_._2).distinct, index.termStats)
    val ids = dict.values.map(_._1).toSeq.distinct
    println(s"distinct terms=${rows.map(_._2).distinct.size} resolved=${dict.size}")
    val nBlocks = index.probeBlocks(ids).count()
    val nPostings = index.decode(index.probeBlocks(ids)).count()
    println(s"probed blocks=$nBlocks decoded postings=$nPostings")

    time("compile")(Bm25Search.compileQueriesLocal(queries, index.termStats).count())
    val qterms = Bm25Search.compileQueriesLocal(queries, index.termStats)
    time("probe_scan")(index.probeBlocks(ids).count())
    time("decode")(index.decode(index.probeBlocks(ids)).count())
    val decoded = index.decode(index.probeBlocks(ids))
    time("hits")(Bm25Search.hits(qterms, decoded, index.corpusStatsLocal).count())
    val hs = Bm25Search.hits(qterms, decoded, index.corpusStatsLocal)
    time("scores")(Bm25Search.scores(hs).count())
    val sc = Bm25Search.scores(hs)
    time("topk")(Bm25Search.topK(sc, 10).count())
    time("full_searchPersisted")(Bm25Search.searchPersisted(queries, index, 10).count())
    spark.stop()
  }
}
