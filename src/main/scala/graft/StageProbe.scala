package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.corpus.Synthesizer
import graft.index.IndexBuilder
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "500000").toLong
    for (cpus <- sys.env.getOrElse("PROBE_CPUS", "8,32").split(",").map(_.trim.toInt)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions",
          (cpus * sys.env.getOrElse("PROBE_SHUFFLE_MULT", "1").toInt).toString)
        .config("spark.io.compression.codec",
          sys.env.getOrElse("PROBE_CODEC", "lz4"))
        .config("spark.shuffle.compress",
          sys.env.getOrElse("PROBE_SHUFFLE_COMPRESS", "true"))
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // warmup
      IndexBuilder.build(spark, Synthesizer.pages(spark, 2000, cpus),
        Files.createTempDirectory(s"warm-$cpus").toString, auditExtraction = false)
      val pagesDir = Files.createTempDirectory(s"probe-pages-$cpus").toString
      val inParts = sys.env.getOrElse("PROBE_INPUT_PARTS", (cpus * 4).toString).toInt
      Synthesizer.pages(spark, n, inParts).write.mode("overwrite").parquet(pagesDir)
      for (rep <- 1 to sys.env.getOrElse("PROBE_REPS", "1").toInt) {
        val dir = Files.createTempDirectory(s"probe-$cpus-$rep").toString
        val t0 = System.nanoTime()
        val reps = IndexBuilder.build(spark, spark.read.parquet(pagesDir), dir,
          auditExtraction = false)
        val total = (System.nanoTime() - t0) / 1e9
        println(f"PROBE cpus=$cpus rep=$rep total=$total%.1f " +
          reps.map(r => f"${r.stage}=${r.seconds}%.1f").mkString(" "))
      }
      spark.stop()
    }
  }
}
