package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

/** WAND-regime probe: measures the staged-pruning path against the full
  * decode path in the regime block-max WAND exists for (reference
  * index_storage.py:111-194) — queries mixing ONE mid-frequency term with
  * corpus-saturating stopwords. In the synthesized Zipf corpus w0–w2
  * appear in ~every doc (df≈N → idf≈0 → always WEAK), so the full path
  * must decode ~N·|stopwords| postings while WAND decodes only the
  * mid-frequency term's candidate blocks. Prints wall times (min of
  * `PROBE_REPS` warm runs) and the decoded-block counts of both paths.
  *
  * Notes on the regimes this corpus can NOT show a win in: a
  * planted-rare-term query (df=1 < k) yields no θ, so WAND lawfully
  * degenerates to full + bound overhead; an all-stopword query has no
  * strong term to prune by. Both are reported by the r2 probe history;
  * this probe adds the missing third regime.
  */
object WandProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "4000000").toLong
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
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
    def tmin(f: => Any): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    // mixed regime: one mid-frequency strong term + stopwords the bound
    // proves weak (w0/w1/w2 are in ~every doc of the Zipf corpus)
    val mixed = (0 until 8).map(i => (i.toLong, s"w${300 + 13 * i} w0 w1 w2"))
      .toDF("qid", "text").cache(); mixed.count()
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
    val (bFull, pFull) = probed.agg(org.apache.spark.sql.functions.count(col("n")),
      org.apache.spark.sql.functions.sum(col("n"))).as[(Long, Long)].head()
    val (bWand, pWand) = wandProbed.agg(org.apache.spark.sql.functions.count(col("n")),
      org.apache.spark.sql.functions.sum(col("n"))).as[(Long, Long)].head()
    println(f"WANDPROBE n=$n mixedFull=$tFull%.2f mixedWand=$tWand%.2f " +
      f"blocksFull=$bFull blocksWand=$bWand postingsFull=$pFull postingsWand=$pWand " +
      f"blockRatio=${bFull.toDouble / math.max(1, bWand)}%.1f")
    spark.stop()
  }
}
