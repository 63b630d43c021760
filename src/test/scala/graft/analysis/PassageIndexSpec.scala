package graft.analysis

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synthesizer
import graft.eval.OracleBm25
import graft.query.{Bm25IndexTables, Bm25Search}

/** Passage-level retrieval composes from the existing operators exactly
  * like the reference pipeline (docs2passages → index passages → search →
  * map pids back to parent docs, docs2passages.py + loaders.py): segment
  * pages into windows, index passages as documents with a composite id,
  * and verify against the oracle over the passage corpus. */
class PassageIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("segment → index passages → search ≡ oracle; hits map to parent docs") {
    val docs = Synthesizer.withDocIds(Synthesizer.pages(spark, 120, 3))
      .select(col("doc_id"), col("text"))
    val passages = Passages.segment(docs, window = 48, overlap = 16)
      .select(
        (col("doc_id") * 10000 + col("passage_no")).as("doc_id"),
        col("passage_text").as("text"))
      .cache()
    val index = Bm25IndexTables.fromDocs(passages)
    val queries = Synthesizer.queries(spark, 12, 120)

    val got = Bm25Search.searchFull(queries, index, 5)
      .select(col("qid"), col("doc_id"), col("rank"), col("score"))
      .as[(Long, Long, Int, Double)].collect().toSeq
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(r => (r._2, r._3, r._4)) }

    val want = OracleBm25.topK(
      passages.as[(Long, String)].collect().toSeq,
      queries.as[(Long, String)].collect().toSeq, 5).filter(_._2.nonEmpty)
    assert(got.keySet == want.keySet)
    want.foreach { case (q, w) => assert(got(q) == w, s"qid=$q") }

    // composite ids decode back to (parent doc, passage) for result display
    val parents = got.values.flatten.map(_._1 / 10000).toSet
    val validIds = docs.select(col("doc_id")).as[Long].collect().toSet
    assert(parents.subsetOf(validIds))
  }
}
