package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Diagnostic: per-stage build timings under the EXACT bench protocol
  * (forked, taskset-pinned, ActiveProcessorCount-capped ScaleRunner
  * JVMs) at each requested core count — the data for attacking the
  * full-machine (8v32) scaling ratio. Prints every child STAGES/SCALE
  * line. Env: PROBE_DOCS (default 1000000), PROBE_CPUS (default "8,32").
  */
object BuildScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val cpusList = sys.env.getOrElse("PROBE_CPUS", "8,32").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = Files.createTempDirectory("graft-bsp-pages").toString
    corpus.Synthesizer.pages(spark, nDocs, 128).write.mode("overwrite").parquet(pagesDir)
    spark.stop()
    try {
      for (cpus <- cpusList) {
        val out = BenchFork.fork("graft.ScaleRunner", cpus,
          Seq(cpus.toString, nDocs.toString, pagesDir))
        out.linesIterator.filter(l => l.startsWith("STAGES") || l.startsWith("SCALE"))
          .foreach(println)
      }
    } finally BenchFork.deleteRecursively(pagesDir)
  }
}
