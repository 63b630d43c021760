package graft.eval

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.analysis.Tokenizer
import graft.corpus.Synthesizer
import graft.query.{Bm25IndexTables, Bm25Search}

/** End-to-end retrieval-quality gate — the analog of the reference's
  * Success@5 > 0.93 assertion (colbert/tests/e2e_test.py:73-79), made
  * EXACT: planted rare terms give every planted query one known relevant
  * doc, and a correct BM25 engine must surface it at rank 1 (a planted
  * term's idf dwarfs every other contribution). */
class EvalGateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("planted-query Success@5 == 1.0 and MRR@10 == 1.0") {
    val nDocs = 500L
    val docs = Synthesizer.withDocIds(Synthesizer.pages(spark, nDocs, 4))
      .select(col("doc_id"), col("text")).cache()
    val index = Bm25IndexTables.fromDocs(docs)

    // planted queries: "plant<i> <filler>" — qrel = the doc carrying plant<i>
    val planted = Synthesizer.queries(spark, 40, nDocs)
      .filter(col("text").startsWith("plant"))
    assert(planted.count() >= 5, "fixture must include planted queries")

    val qrels = planted
      .select(col("qid"), split(col("text"), " ").getItem(0).as("pterm"))
      .join(
        docs.select(col("doc_id"),
          explode(Tokenizer.tokenizeDoc(col("text"))).as("pterm")),
        "pterm")
      .select(col("qid"), col("doc_id"))
    assert(qrels.groupBy(col("qid")).count().filter(col("count") =!= 1).count() == 0,
      "each planted term must identify exactly one doc")

    val ranking = Bm25Search.searchFull(planted, index, 10)
    val metrics = Metrics.summary(Metrics.perQueryMetrics(
      ranking.select(col("qid"), col("doc_id"), col("rank")), qrels))
      .as[(Double, Double, Double, Long)].head()

    assert(metrics._1 == 1.0, s"MRR@10 = ${metrics._1}, expected 1.0")
    assert(metrics._3 == 1.0, s"Success@5 rate = ${metrics._3}, expected 1.0")
    assert(metrics._4 == planted.count())
  }

  test("bestCheckpoint argmaxes the metric with a deterministic tiebreak") {
    val evals = Seq(
      ("colbert-1000", 0.31, 0.80),
      ("colbert-2000", 0.42, 0.85),
      ("colbert-3000", 0.42, 0.90), // ties 2000 on mrr10 — lower id wins
      ("colbert-500", 0.12, 0.99))
      .toDF("checkpoint", "mrr10", "recall10")
    val best = Metrics.bestCheckpoint(evals, "mrr10")
      .as[(String, Double, Double)].collect()
    assert(best.toSeq == Seq(("colbert-2000", 0.42, 0.85)))
    // a different metric column selects a different winner
    val byRecall = Metrics.bestCheckpoint(evals, "recall10")
      .select(col("checkpoint")).as[String].head()
    assert(byRecall == "colbert-500")
  }
}
