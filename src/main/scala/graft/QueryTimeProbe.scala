package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: time individual SparkEntry queries at a given SF dir,
  * under the same session shape as the bench sweep:
  * `QueryTimeProbe <sfDir> <query> [<query> ...]`. Fixtures are prepared
  * first (unreported), matching Bench's accounting. */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.prepareFixtures(spark, sfDir)
    for (rep <- 1 to sys.env.getOrElse("PROBE_REPS", "2").toInt; name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"QTIME $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f sec rows=$n")
    }
    spark.stop()
  }
}
