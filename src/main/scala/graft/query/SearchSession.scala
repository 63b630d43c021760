package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Bm25Params, IndexUpdater}

/** One serving response row — the reference's per-hit dict
  * `{text, pid, rank, score, prob}` (server.py:30-33). */
final case class ServeHit(docId: Long, rank: Int, score: Double, prob: Double, text: String)

/** Warm serving session over a persisted index — the reference keeps its
  * index resident for the life of a Searcher and serves an HTTP loop over
  * it (colbert/search/index_loader.py:25-27, server.py:19-44); the Spark
  * equivalent persists the (merged) index tables once and answers every
  * subsequent query from cache. Point queries skip the parquet scan and
  * run against in-memory columnar batches (batch-level term stats still
  * prune).
  *
  * [[serve]] is the full server.py analog: LRU-cached per (query, k),
  * top-k joined back to passage text, scores softmax-normalized into
  * probs, (−score, docId) ordered. The HTTP frontend itself stays a
  * non-goal — any servlet can wrap `serve` — but the response contract
  * is reproduced and tested.
  *
  * At scale this is the serving-tier pattern from SCALE.md: hot posting
  * blocks pinned in executor memory, queries as small broadcast joins. */
final class SearchSession private (spark: SparkSession, val index: Bm25IndexTables,
                                   docsText: DataFrame) {

  def search(queries: DataFrame, k: Int, p: Bm25Params = Bm25Params()): DataFrame =
    Bm25Search.searchPersisted(queries, index, k, p)

  /** Single-query convenience (the server.py-style entry point). */
  def searchOne(text: String, k: Int): DataFrame = {
    import spark.implicits._
    search(Seq((0L, text)).toDF("qid", "text"), k)
  }

  /** server.py:19-35 `api_search_query`: top-k hits with passage text and
    * softmax probabilities over the returned scores, cached per
    * (query, k) in an LRU (reference maxsize 10^6; k capped at 100).
    * The k-row collect IS the response — bounded by construction. */
  def serve(query: String, k: Int): Seq[ServeHit] = {
    val kk = math.min(k, MaxServeK)
    cached((query, kk)) {
      import spark.implicits._
      val hits = searchOne(query, kk)
        .join(docsText, "doc_id")
        .select(col("doc_id"), col("rank"), col("score"), col("text"))
        .as[(Long, Int, Double, String)]
        .collect()
        .sortBy { case (d, _, s, _) => (-s, d) }
      val weights = hits.map { case (_, _, s, _) => math.exp(s) }
      val z = weights.sum
      hits.zip(weights).map { case ((d, r, s, t), w) =>
        ServeHit(d, r, s, if (z > 0) w / z else 0.0, t)
      }.toSeq
    }
  }

  private val MaxServeK = 100
  private val MaxCacheEntries = 1000000
  private val lru = new java.util.LinkedHashMap[(String, Int), Seq[ServeHit]](
    16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, Int), Seq[ServeHit]]): Boolean =
      size() > MaxCacheEntries
  }
  private def cached(key: (String, Int))(compute: => Seq[ServeHit]): Seq[ServeHit] =
    lru.synchronized {
      val hit = lru.get(key)
      if (hit != null) hit
      else { val v = compute; lru.put(key, v); v }
    }
  /** Cache entry count (for tests / metrics). */
  def cacheSize: Int = lru.synchronized(lru.size())

  def close(): Unit = {
    index.blocks.unpersist()
    index.termStats.unpersist()
    index.corpusStats.unpersist()
    docsText.unpersist()
    ()
  }
}

object SearchSession {
  /** Open base + segments − tombstones, persist and MATERIALIZE the index
    * tables (the open cost is paid once, like the reference's index
    * load). */
  def open(spark: SparkSession, indexDir: String): SearchSession = {
    val idx = IndexUpdater.openMerged(spark, indexDir)
    val warm = idx.copy(
      blocks = idx.blocks.persist(),
      termStats = idx.termStats.persist(),
      corpusStats = idx.corpusStats.persist())
    warm.blocks.count(); warm.termStats.count(); warm.corpusStats.count()
    val docsText = IndexUpdater.liveDocs(spark, indexDir)
      .select(col("doc_id"), col("text")).persist()
    new SearchSession(spark, warm, docsText)
  }
}
