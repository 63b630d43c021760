package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Diagnostic: ONE scaling pair with the full bench protocol (pinned
  * forks, min-of-7 builds) and the per-stage STAGES breakdown surfaced,
  * to see WHICH build stage sags when cores quadruple.
  *
  * `PairProbe [nLow] [nHigh] [nDocs]` (defaults 8 32 1000000).
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val nLow = args.lift(0).map(_.toInt).getOrElse(8)
    val nHigh = args.lift(1).map(_.toInt).getOrElse(32)
    val nDocs = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pair-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = Files.createTempDirectory("graft-pair-pages").toString
    try {
      corpus.Synthesizer.pages(spark, nDocs, 128).write.mode("overwrite").parquet(pagesDir)
      spark.stop() // children must not share cores with a live parent
      Seq(nLow, nHigh).foreach { cpus =>
        val out = BenchFork.fork("graft.ScaleRunner", cpus,
          Seq(cpus.toString, nDocs.toString, pagesDir))
        out.linesIterator
          .filter(l => l.startsWith("STAGES") || l.startsWith("SCALE"))
          .foreach(println)
      }
    } finally BenchFork.deleteRecursively(pagesDir)
  }
}
