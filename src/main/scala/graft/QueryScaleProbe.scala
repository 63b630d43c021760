package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

/** ScaleRunner's query-path measurement alone, over a REUSED index dir:
  * batch-40 searchPersisted (min of 5) + warm-session p50 over 11 singles.
  * `runMain graft.QueryScaleProbe <indexDir> <nDocs> [cpus]`. */
object QueryScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nDocs = args(1).toLong
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.shuffle.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val index = IndexBuilder.open(spark, dir)
    val queries = Synthesizer.queries(spark, 40, nDocs)
    val qs = (1 to 5).map { _ =>
      val t1 = System.nanoTime()
      Bm25Search.searchPersisted(queries, index, 10).count()
      (System.nanoTime() - t1) / 1e9
    }
    import spark.implicits._
    val session = graft.query.SearchSession.open(spark, dir)
    val singles = Synthesizer.queries(spark, 11, nDocs).as[(Long, String)].collect().toSeq
    val lats = singles.map { case (_, text) =>
      val s0 = System.nanoTime()
      session.searchOne(text, 10).count()
      (System.nanoTime() - s0) / 1e9
    }.sorted
    println(f"QSCALE batch40_min=${qs.min}%.2f runs=${qs.map(t => f"$t%.2f").mkString(",")} " +
      f"p50=${lats(lats.size / 2)}%.3f p90=${lats(lats.size - 2)}%.3f")
    spark.stop()
  }
}
