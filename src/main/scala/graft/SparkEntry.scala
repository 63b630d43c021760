package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.Bm25Index
import graft.query.{Bm25IndexTables, Bm25Search}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in
  * [[oracleSql]] (DuckDB dialect) over the same parquet tables, unless
  * stated otherwise. Columns are name- and type-aligned with the oracle;
  * doubles are rounded on BOTH sides so the driver's value-hash compare
  * is stable across engines.
  */
object SparkEntry {

  /** Fixed MS-MARCO-style dev query set over the synthetic `documents`
    * vocabulary (reference query shape: colbert/evaluation/loaders.py:15-30).
    * Includes multi-hit conjunctions, a stopword-ish query, a repeated-term
    * query and a zero-hit query (edge cases per FIXTURES.md §2). */
  val FlagshipQueries: Seq[(Long, String)] = Seq(
    1L -> "spark merge join",
    2L -> "vector hash agg",
    3L -> "customer order stream",
    4L -> "slow query filter",
    5L -> "window group sort",
    6L -> "key value table",
    7L -> "batch scan line",
    8L -> "big data column",
    9L -> "zzznonexistent qqqmissing",
    10L -> "the the a table")

  private def flagshipQueriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    FlagshipQueries.toDF("qid", "text")
  }

  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("bm25_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- index build stages (SURVEY §2.3 T2, §2.5 A2/A4, §3.1) ----
    "tokenize_terms" -> ((s, dir) =>
      Bm25Index.docTerms(docs(s, dir))),

    "postings_tf" -> ((s, dir) =>
      Bm25Index.postings(docs(s, dir))),

    "doc_stats" -> ((s, dir) =>
      Bm25Index.docStats(docs(s, dir))),

    "corpus_stats" -> ((s, dir) =>
      Bm25Index.corpusStats(Bm25Index.docStats(docs(s, dir)))
        .select(col("n_docs"), round(col("avgdl"), 6).as("avgdl"))),

    "term_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      val p = Bm25Index.postings(d)
      val c = Bm25Index.corpusStats(Bm25Index.docStats(d))
      Bm25Index.termStats(p, c)
        .select(col("term"), col("df"), round(col("idf"), 6).as("idf"))
    }),

    // ---- end-to-end search through the compressed block index ----
    // (SURVEY §3.2; exercises tokenize → postings → delta+varint blocks →
    //  decode → BM25 → top-k in one Catalyst plan)
    "bm25_topk" -> ((s, dir) => {
      val index = Bm25IndexTables.fromDocs(docs(s, dir))
      Bm25Search.searchFull(flagshipQueriesDf(s), index, 10)
        .select(col("qid"), col("doc_id"), col("rank"),
          round(col("score"), 4).as("score"))
    }),

    // same result through the two-stage block-max pruned path (§2.7 O3)
    "bm25_topk_wand" -> ((s, dir) => {
      val index = Bm25IndexTables.fromDocs(docs(s, dir))
      Bm25Search.searchWand(flagshipQueriesDf(s), index, 10)
        .select(col("qid"), col("doc_id"), col("rank"),
          round(col("score"), 4).as("score"))
    }),

    // same result through the bounded-heap distributed top-k (§2.11)
    "bm25_topk_agg" -> ((s, dir) => {
      val index = Bm25IndexTables.fromDocs(docs(s, dir))
      Bm25Search.searchFullAgg(flagshipQueriesDf(s), index, 10)
        .select(col("qid"), col("doc_id"), col("rank"),
          round(col("score"), 4).as("score"))
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL. Tokenizer parity: Spark's code-point scanner ≡
  // regexp_split_to_array(lower(text), '[^\p{L}\p{Nd}]+') + drop empties +
  // truncate (verified byte-identical on the sf tables).
  // ---------------------------------------------------------------------

  private val ToksDoc =
    """list_slice(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{Nd}]+'), x -> x <> ''), 1, 220)"""
  private def toksQuery(textExpr: String) =
    s"""list_slice(list_filter(regexp_split_to_array(lower($textExpr), '[^\\p{L}\\p{Nd}]+'), x -> x <> ''), 1, 32)"""

  /** VALUES list mirroring [[FlagshipQueries]]. */
  private val QueryValues: String =
    FlagshipQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** Shared CTE prefix: tokenize + postings + stats + compiled queries. */
  private val Bm25Cte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $ToksDoc AS toks FROM documents
       |), terms AS (
       |  SELECT doc_id, unnest(toks) AS term FROM toks
       |), tf AS (
       |  SELECT term, doc_id, count(*)::INT AS tf FROM terms GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, len(toks)::INT AS dl FROM toks
       |), stats AS (
       |  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl
       |), df AS (
       |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
       |), idf AS (
       |  SELECT term, df, ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
       |  FROM df CROSS JOIN stats s
       |), q(qid, qtext) AS (
       |  VALUES $QueryValues
       |), qtok AS (
       |  SELECT qid::BIGINT AS qid, unnest(${toksQuery("qtext")}) AS term FROM q
       |), qterms AS (
       |  SELECT qid, term, count(*)::INT AS qtf FROM qtok GROUP BY 1, 2
       |), hits AS (
       |  SELECT qt.qid, tf.doc_id,
       |         qt.qtf * i.idf * (tf.tf * (0.9 + 1.0) /
       |           (tf.tf + 0.9 * (1.0 - 0.4 + 0.4 * dl.dl / s.avgdl))) AS partial
       |  FROM qterms qt
       |  JOIN idf i USING (term)
       |  JOIN tf ON tf.term = qt.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats s
       |), scores AS (
       |  SELECT qid, doc_id, sum(partial) AS score FROM hits GROUP BY 1, 2
       |), ranked AS (
       |  SELECT qid, doc_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)::INT AS rank,
       |         score
       |  FROM scores
       |)""".stripMargin

  private val Bm25TopkSql: String =
    s"""$Bm25Cte
       |SELECT qid, doc_id, rank, round(score, 4) AS score
       |FROM ranked WHERE rank <= 10""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "tokenize_terms" ->
      s"""WITH toks AS (SELECT doc_id, $ToksDoc AS toks FROM documents)
         |SELECT doc_id, unnest(toks) AS term FROM toks""".stripMargin,

    "postings_tf" ->
      s"""WITH toks AS (SELECT doc_id, $ToksDoc AS toks FROM documents),
         |terms AS (SELECT doc_id, unnest(toks) AS term FROM toks)
         |SELECT term, doc_id, count(*)::INT AS tf FROM terms GROUP BY 1, 2""".stripMargin,

    "doc_stats" ->
      s"""SELECT doc_id, len($ToksDoc)::INT AS dl FROM documents""",

    "corpus_stats" ->
      s"""WITH dl AS (SELECT len($ToksDoc)::INT AS dl FROM documents)
         |SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl FROM dl""".stripMargin,

    "term_stats" ->
      s"""WITH toks AS (SELECT doc_id, $ToksDoc AS toks FROM documents),
         |terms AS (SELECT doc_id, unnest(toks) AS term FROM toks),
         |tf AS (SELECT term, doc_id FROM terms GROUP BY 1, 2),
         |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
         |SELECT term, df,
         |       round(ln(((SELECT count(*) FROM documents) - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
         |FROM df""".stripMargin,

    "bm25_topk" -> Bm25TopkSql,
    "bm25_topk_wand" -> Bm25TopkSql,
    "bm25_topk_agg" -> Bm25TopkSql
  )
}
