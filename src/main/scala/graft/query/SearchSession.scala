package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.{Bm25Params, IndexUpdater}

/** Warm serving session over a persisted index — the reference keeps its
  * index resident for the life of a Searcher and serves an HTTP loop over
  * it (colbert/search/index_loader.py:25-27, server.py:19-44); the Spark
  * equivalent persists the (merged) index tables once and answers every
  * subsequent query from cache. Point queries skip the parquet scan and
  * run against in-memory columnar batches (batch-level term stats still
  * prune).
  *
  * At scale this is the serving-tier pattern from SCALE.md: hot posting
  * blocks pinned in executor memory, queries as small broadcast joins. */
final class SearchSession private (spark: SparkSession, val index: Bm25IndexTables) {

  def search(queries: DataFrame, k: Int, p: Bm25Params = Bm25Params()): DataFrame =
    Bm25Search.searchPersisted(queries, index, k, p)

  /** Single-query convenience (the server.py-style entry point). */
  def searchOne(text: String, k: Int): DataFrame = {
    import spark.implicits._
    search(Seq((0L, text)).toDF("qid", "text"), k)
  }

  def close(): Unit = {
    index.blocks.unpersist()
    index.termStats.unpersist()
    index.corpusStats.unpersist()
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
    new SearchSession(spark, warm)
  }
}
