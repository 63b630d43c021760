package graft.tmp

import org.apache.spark.sql.SparkSession

/** Scratch: time one SparkEntry query at a given sf dir. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"QPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f sec $n rows")
    }
    spark.stop()
  }
}
