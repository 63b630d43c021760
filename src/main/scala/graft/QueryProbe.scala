package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: runMain graft.QueryProbe <sfDir> <q1,q2,...>
  * (comma list or 'all'). Times each query twice (cold, warm). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length < 2 || args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $name rows=${times.head._2} cold=${times(0)._1}%.2fs warm=${times(1)._1}%.2fs")
    }
    spark.stop()
  }
}
