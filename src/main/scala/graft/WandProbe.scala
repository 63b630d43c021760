package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{abs, col, count, lit, sum}
import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

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
    import spark.implicits._

    // strong term by MEASURED df: ≥ k so θ seeds, ≪ #blocks so the term
    // is block-sparse; deterministic pick (closest to 20, term tiebreak)
    val rare = index.termStats
      .filter(col("df").between(12, 40) && col("term").startsWith("w"))
      .orderBy(abs(col("df") - 20), col("term"))
      .select(col("term"), col("df")).as[(String, Long)].head()
    val mixed = Seq((0L, s"${rare._1} w0 w1 w2")).toDF("qid", "text").cache()
    mixed.count()

    def tmin(f: => Any): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    // warm both paths once (plan compile + page cache), then time
    Bm25Search.searchPersisted(mixed, index, 10).count()
    Bm25Search.searchPersistedWand(mixed, index, 10).count()
    val tFull = tmin { Bm25Search.searchPersisted(mixed, index, 10).count() }
    val tWand = tmin { Bm25Search.searchPersistedWand(mixed, index, 10).count() }

    // decode-volume evidence: blocks (and encoded postings) each path decodes
    val qterms = Bm25Search.compileQueriesLocal(mixed, index.termStats)
    val ids = qterms.select(col("term_id")).distinct().as[Long].collect().toSeq
    val probed = index.blocks.filter(col("term_id").isin(ids: _*))
    val cand = Bm25Search.wandCandidateBlocks(qterms, probed, index, 10, graft.index.Bm25Params())
    val candNos = cand.select(col("block_no")).distinct()
    val wandProbed = probed.join(candNos, Seq("block_no"), "left_semi")
    val (bFull, pFull) = probed.agg(count(lit(1)), sum(col("n"))).as[(Long, Long)].head()
    val (bWand, pWand) = wandProbed.agg(count(lit(1)), sum(col("n"))).as[(Long, Long)].head()
    println(f"WANDPROBE n=$n vocab=$vocab rare=${rare._1} df=${rare._2} " +
      f"mixedFull=$tFull%.2f mixedWand=$tWand%.2f " +
      f"blocksFull=$bFull blocksWand=$bWand postingsFull=$pFull postingsWand=$pWand " +
      f"blockRatio=${bFull.toDouble / math.max(1, bWand)}%.1f " +
      f"postingRatio=${pFull.toDouble / math.max(1, pWand)}%.1f")
    spark.stop()
  }
}
