package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic: per-stage wall breakdown of the slowest sweep entries.
  *
  * `SweepProbe [sfDir] [names...]` runs the named SparkEntry queries
  * (default: the slowest ones from the last bench sweep) TWICE each —
  * cold then warm — after forcing the shared fixtures, printing
  *
  *   SWEEP <name> cold_ms=<c> warm_ms=<w>
  *
  * The cold/warm split separates plan/jit/one-time-fixture cost from the
  * recurring query cost the bench sweep reports.
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_jaccard", "train_ib_scores", "train_losses",
        "text_decontaminate", "dedup_minhash", "web_host_stats")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sweep-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fx = SparkEntry.prepareFixtures(spark, sfDir)
    fx.foreach { case (k, v) => println(f"FIXTURE $k ${v * 1000}%.0f ms") }

    def t(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e6
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val cold = t(fn(spark, sfDir))
      val warm = t(fn(spark, sfDir))
      println(f"SWEEP $n cold_ms=$cold%.0f warm_ms=$warm%.0f")
    }
    spark.stop()
  }
}
