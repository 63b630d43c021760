package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.corpus.Synthesizer
import graft.index.IndexBuilder

/** WAND-regime probe: measures the staged-pruning path against the full
  * decode path in the regime block-max WAND exists for (reference
  * index_storage.py:111-194) — a query mixing ONE genuinely rare term
  * with corpus-saturating stopwords.
  *
  * Regime notes (why these parameters):
  * - The corpus uses a web-scale vocabulary (`PROBE_VOCAB`, default 2M)
  *   instead of the 5k test vocabulary: with 5k Zipf terms every term's
  *   df exceeds the number of doc-range blocks (N/8192), so every term
  *   has a posting in every block and BLOCK-granular bounds can prune
  *   nothing — measured r3: blockRatio exactly 1.0. Real web text has a
  *   long df tail; 2M terms reproduce it.
  * - The strong term is chosen from termstats by MEASURED df in
  *   [12, 40]: df must be ≥ k (else no θ seed exists and pruning
  *   lawfully disables) and ≪ the block count (else the term occupies
  *   every block and nothing can be excluded).
  * - Stopwords w0-w2 saturate the corpus (df≈N → idf≈0): the ascending
  *   max-contribution prefix below θ proves them WEAK, so their posting
  *   lists — the overwhelming share of decode volume — are read only
  *   inside the ~df surviving candidate blocks.
  *
  * Regimes WAND cannot win (measured in r2 probes, unchanged): a
  * planted-rare-term query (df=1 < k) yields no θ, so WAND lawfully
  * degenerates to full + bound overhead; an all-stopword query has no
  * strong term to prune by; a mid-frequency strong term (df ≥ #blocks)
  * leaves a posting in every block (r3 probe, blockRatio 1.0). The
  * documented default stays `searchPersisted`.
  */
object WandProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "6000000").toLong
    val vocab = sys.env.getOrElse("PROBE_VOCAB", "2000000").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pagesDir = Files.createTempDirectory("graft-wand-pages").toString
    val dir = Files.createTempDirectory("graft-wand-index").toString
    Synthesizer.pages(spark, n, 256, vocab = vocab)
      .write.mode("overwrite").parquet(pagesDir)
    IndexBuilder.build(spark, spark.read.parquet(pagesDir), dir, auditExtraction = false)
    val index = IndexBuilder.open(spark, dir)
    val r = WandRegime.measure(spark, index, reps = reps)
    println(f"WANDPROBE n=$n vocab=$vocab rare=${r.rareTerm} df=${r.rareDf} " +
      f"mixedFull=${r.tFull}%.2f mixedWand=${r.tWand}%.2f " +
      s"blocksFull=${r.blocksFull} blocksWand=${r.blocksWand} " +
      s"postingsFull=${r.postingsFull} postingsWand=${r.postingsWand} " +
      f"blockRatio=${r.blocksFull.toDouble / math.max(1, r.blocksWand)}%.1f " +
      f"postingRatio=${r.postingsFull.toDouble / math.max(1, r.postingsWand)}%.1f")
    spark.stop()
  }
}
