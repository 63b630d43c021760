package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

/** One isolated scaling measurement: `ScaleRunner <cpus> <nDocs>` builds
  * the full persisted index over nDocs synthesized pages at local[cpus]
  * (after a small warmup build) and prints ONE line:
  * `SCALE <cpus> <build_sec> <query_sec>`.
  *
  * Run in its OWN JVM by Bench — successive SparkSessions inside one JVM
  * measurably degrade (accumulated codegen/metaspace/GC state: observed
  * 3× inflation by the fifth session), so each measurement forks, exactly
  * like one spark-submit per cluster size would. */
object ScaleRunner {

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
    val nDocs = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmDir = Files.createTempDirectory(s"graft-warm-$cpus").toString
    IndexBuilder.build(spark, Synthesizer.pages(spark, 2000, cpus), warmDir,
      auditExtraction = false)
    // materialize the input corpus to parquet UNTIMED: synthesis cost is
    // not indexing throughput (a real pipeline reads pages from storage)
    val pagesDir = Files.createTempDirectory(s"graft-pages-$cpus").toString
    Synthesizer.pages(spark, nDocs, cpus * 4).write.mode("overwrite").parquet(pagesDir)
    val pages = spark.read.parquet(pagesDir)
    // min of two timed builds in the SAME session: repeated builds within
    // one session are stable (unlike across sessions), and the min sheds
    // the VM's episodic CPU-steal bursts
    var dir = ""
    val dirs = scala.collection.mutable.ArrayBuffer[String]()
    val buildSec = (1 to 2).map { r =>
      dir = Files.createTempDirectory(s"graft-scale-$cpus-$r").toString
      dirs += dir
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, pages, dir, auditExtraction = false)
      (System.nanoTime() - t0) / 1e9
    }.min
    val index = IndexBuilder.open(spark, dir)
    val queries = Synthesizer.queries(spark, 40, nDocs)
    val t1 = System.nanoTime()
    Bm25Search.searchPersisted(queries, index, 10).count()
    val querySec = (System.nanoTime() - t1) / 1e9
    // single-query p50 latency over a WARM serving session — the
    // reference's per-query perf_counter analog (searcher.py:101-114)
    import spark.implicits._
    val session = graft.query.SearchSession.open(spark, dir)
    val singles = Synthesizer.queries(spark, 21, nDocs).as[(Long, String)].collect().toSeq
    val lats = singles.map { case (_, text) =>
      val s0 = System.nanoTime()
      session.searchOne(text, 10).count()
      (System.nanoTime() - s0) / 1e9
    }.sorted
    val p50 = lats(lats.size / 2)
    println(f"SCALE $cpus $buildSec%.3f $querySec%.3f $p50%.4f")
    spark.stop()
    // a bench run must not leak tens of GB of temp indexes (the VM disk
    // filled after a day of probing)
    (Seq(warmDir, pagesDir) ++ dirs).foreach(deleteRecursively)
  }
}
