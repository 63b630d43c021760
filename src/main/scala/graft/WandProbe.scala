package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search
object WandProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "5000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = Files.createTempDirectory("wp-pages").toString
    Synthesizer.pages(spark, n, 128).write.mode("overwrite").parquet(pagesDir)
    val dir = Files.createTempDirectory("wp-idx").toString
    IndexBuilder.build(spark, spark.read.parquet(pagesDir), dir, auditExtraction = false)
    val index = IndexBuilder.open(spark, dir)
    import spark.implicits._
    def t(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    // selective: planted term + one mid-frequency term
    val sel = Seq((1L, "plant77 w900"), (2L, "plant1234 w1700")).toDF("qid", "text").cache(); sel.count()
    // broad: stopword-grade pair
    val broad = Seq((1L, "w0 w1"), (2L, "w2 w5")).toDF("qid", "text").cache(); broad.count()
    val sFull = t { Bm25Search.searchPersisted(sel, index, 10).count() }
    val sWand = t { Bm25Search.searchPersistedWand(sel, index, 10).count() }
    val sWand2 = t { Bm25Search.searchPersistedWand(sel, index, 10).count() }
    val bFull = t { Bm25Search.searchPersisted(broad, index, 10).count() }
    val bWand = t { Bm25Search.searchPersistedWand(broad, index, 10).count() }
    println(f"WANDPROBE n=$n selFull=$sFull%.1f selWand=$sWand%.1f selWand2=$sWand2%.1f broadFull=$bFull%.1f broadWand=$bWand%.1f")
    spark.stop()
  }
}
