package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.corpus.Synthesizer
import graft.index.IndexBuilder

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
    val pagesDir = Files.createTempDirectory("graft-wandregime-pages").toString
    val dir = Files.createTempDirectory("graft-wandregime-index").toString
    try {
      Synthesizer.pages(spark, nPages, 256, vocab = vocab)
        .write.mode("overwrite").parquet(pagesDir)
      IndexBuilder.build(spark, spark.read.parquet(pagesDir), dir,
        auditExtraction = false)
      val index = IndexBuilder.open(spark, dir)
      val r = WandRegime.measure(spark, index)
      println(f"WANDREGIME ${r.rareTerm} ${r.rareDf} ${r.tFull}%.3f ${r.tWand}%.3f " +
        s"${r.blocksFull} ${r.blocksWand} ${r.postingsFull} ${r.postingsWand}")
      spark.stop()
    } finally {
      Seq(dir, pagesDir).foreach(deleteRecursively)
    }
  }
}
