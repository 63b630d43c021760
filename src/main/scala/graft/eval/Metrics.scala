package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Tokenizer
import graft.index.Bm25Index

/** Ranking-quality metrics as DataFrame math — the engine analog of the
  * reference's evaluation suite (MRR@10 / Recall@k / Success@k,
  * utility/evaluate/msmarco_passages.py:18-134, metrics.py:18-53,
  * evaluate_lotte_rankings.py:8-45). One join + one grouped aggregation;
  * at scale both sides are "small" (rankings are k rows/query) so this is
  * never a bottleneck — it exists for the e2e quality gate.
  */
object Metrics {

  /** Conjunctive relevance qrels derived from the corpus itself: doc is
    * relevant to q iff it contains EVERY query term. Deterministic and
    * reproducible in SQL — the synthetic stand-in for human judgments
    * (reference qrels loader: colbert/evaluation/loaders.py:33-56). */
  def conjunctiveQrels(queries: DataFrame, docs: DataFrame): DataFrame = {
    val qterms = queries
      .select(col("qid"), explode(Tokenizer.tokenizeQuery(col("text"))).as("term"))
      .distinct()
    val nq = qterms.groupBy(col("qid")).agg(count(lit(1)).as("n_terms"))
    val termDocs = Bm25Index.postings(docs).select(col("term"), col("doc_id"))
    qterms.join(nq, "qid")
      .join(termDocs, "term")
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("matched"), max(col("n_terms")).as("n_terms"))
      .filter(col("matched") === col("n_terms"))
      .select(col("qid"), col("doc_id"))
  }

  /** Per-query metrics over a (qid, doc_id, rank) ranking and a
    * (qid, doc_id) qrels table: reciprocal rank @10, recall @10,
    * success @5. Only qids present in qrels are emitted (reference skips
    * unjudged queries, msmarco_passages.py:77-83) — but every JUDGED qid
    * emits a row even when the ranking answered it with zero rows
    * (all-zero metrics): qrels is the join base, so an engine regression
    * that stops answering judged queries drags the summary DOWN instead
    * of silently shrinking the denominator. */
  def perQueryMetrics(ranking: DataFrame, qrels: DataFrame): DataFrame = {
    val relTotals = qrels.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val hits = ranking
      .join(qrels.withColumn("rel", lit(1)), Seq("qid", "doc_id"), "left")
      .select(col("qid"), col("rank"), coalesce(col("rel"), lit(0)).as("rel"))
    val perQ = hits.groupBy(col("qid"))
      .agg(
        coalesce(max(when(col("rel") === 1 && col("rank") <= 10,
          lit(1.0) / col("rank"))), lit(0.0)).as("rr10"),
        sum(when(col("rel") === 1 && col("rank") <= 10, 1).otherwise(0)).as("rel_in_10"),
        coalesce(max(when(col("rel") === 1 && col("rank") <= 5, 1).otherwise(0)), lit(0))
          .as("success5"))
    relTotals.join(perQ, Seq("qid"), "left")
      .select(
        col("qid"),
        round(coalesce(col("rr10"), lit(0.0)), 6).as("rr10"),
        round(coalesce(col("rel_in_10"), lit(0L)).cast("double") / col("n_rel"), 6)
          .as("recall10"),
        coalesce(col("success5"), lit(0)).cast("int").as("success5"),
        col("n_rel"))
  }

  /** Best checkpoint by a metric (SURVEY §2 O7; reference
    * utility/rankings/tune.py:10-47 argmaxes a chosen metric over
    * per-checkpoint eval JSONs and emits the winning checkpoint path).
    * `evals`: one row per checkpoint carrying `idCol` and `metricCol`.
    * Ties break on the checkpoint identifier ascending, so selection is
    * deterministic across runs and engines. */
  def bestCheckpoint(evals: DataFrame, metricCol: String,
                     idCol: String = "checkpoint"): DataFrame =
    evals.orderBy(col(metricCol).desc, col(idCol).asc).limit(1)

  /** Corpus-level rollup: MRR@10, mean recall@10, success@5 rate. */
  def summary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      round(avg(col("rr10")), 6).as("mrr10"),
      round(avg(col("recall10")), 6).as("mean_recall10"),
      round(avg(col("success5")), 6).as("success5_rate"),
      count(lit(1)).as("n_queries"))
}
