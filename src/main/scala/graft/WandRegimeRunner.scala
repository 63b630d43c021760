package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{abs, col, count, lit, sum}

import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

/** One isolated WAND-regime measurement, run in its OWN JVM by Bench:
  * `WandRegimeRunner <cpus> <nPages> <vocab>` synthesizes the web-vocab
  * corpus, builds the persisted index, measures the full vs block-max
  * pruned path on the mixed rare-term + stopword query (the regime the
  * pruning exists for — see WandProbe's scaladoc for the parameter
  * rationale), and prints ONE line:
  *
  * `WANDREGIME <rareTerm> <rareDf> <tFull> <tWand> <bFull> <bWand> <pFull> <pWand>`
  *
  * Forked for the same reason the scale runs are — isolation — plus one
  * more: this is the bench's single largest-memory stage (a multi-GB
  * corpus + 2M-term dictionary build), and running it inside the parent
  * JVM on top of the sweep's cached fixtures stalled the whole bench with
  * GC-starved heartbeats (observed r3: executor exit 56 killed the run
  * and ALL artifacts). In its own right-sized JVM a failure here costs
  * only this arm.
  */
object WandRegimeRunner {

  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files => F, Paths}
    val p = Paths.get(path)
    if (F.exists(p)) {
      import scala.jdk.CollectionConverters._
      F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nPages = args(1).toLong
    val vocab = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-wand-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ride out long GC pauses instead of expiring the local executor
      // (a heartbeat expiry mid-build cascades into a dead context)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pagesDir = Files.createTempDirectory("graft-wandregime-pages").toString
    val dir = Files.createTempDirectory("graft-wandregime-index").toString
    try {
      Synthesizer.pages(spark, nPages, 256, vocab = vocab)
        .write.mode("overwrite").parquet(pagesDir)
      IndexBuilder.build(spark, spark.read.parquet(pagesDir), dir,
        auditExtraction = false)
      val index = IndexBuilder.open(spark, dir)
      // strong term by MEASURED df: ≥ k so θ seeds, ≪ #blocks so the term
      // is block-sparse; deterministic pick (closest to 20, term tiebreak)
      val rare = index.termStats
        .filter(col("df").between(12, 40) && col("term").startsWith("w"))
        .orderBy(abs(col("df") - 20), col("term"))
        .select(col("term"), col("df")).as[(String, Long)].head()
      val mixed = Seq((0L, s"${rare._1} w0 w1 w2")).toDF("qid", "text").cache()
      mixed.count()
      def tmin(f: => Any): Double =
        (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.min
      Bm25Search.searchPersisted(mixed, index, 10).count() // warm both plans
      Bm25Search.searchPersistedWand(mixed, index, 10).count()
      val tFull = tmin(Bm25Search.searchPersisted(mixed, index, 10).count())
      val tWand = tmin(Bm25Search.searchPersistedWand(mixed, index, 10).count())
      // decode-volume evidence: blocks/postings each path physically decodes
      val qterms = Bm25Search.compileQueriesLocal(mixed, index.termStats)
      val ids = qterms.select(col("term_id")).distinct().as[Long].collect().toSeq
      val probed = index.blocks.filter(col("term_id").isin(ids: _*))
      val cand = Bm25Search.wandCandidateBlocks(
        qterms, probed, index, 10, graft.index.Bm25Params())
      val candNos = cand.select(col("block_no")).distinct()
      val (bF, pF) = probed.agg(count(lit(1)), sum(col("n"))).as[(Long, Long)].head()
      val (bW, pW) = probed.join(candNos, Seq("block_no"), "left_semi")
        .agg(count(lit(1)), sum(col("n"))).as[(Long, Long)].head()
      println(f"WANDREGIME ${rare._1} ${rare._2} $tFull%.3f $tWand%.3f $bF $bW $pF $pW")
      spark.stop()
    } finally {
      Seq(dir, pagesDir).foreach(deleteRecursively)
    }
  }
}
