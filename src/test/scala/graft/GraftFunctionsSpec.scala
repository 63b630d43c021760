package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Synthesizer
import graft.query.{Bm25IndexTables, Bm25Search}

/** SQL surface: the custom expressions are registered functions, and the
  * whole BM25 pipeline is expressible in plain `spark.sql` — the lexical
  * engine works as a SQL library, not only through the Scala API. */
class GraftFunctionsSpec extends AnyFunSuite {

  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }
  import spark.implicits._

  test("registered scalar functions evaluate from SQL") {
    val r = spark.sql(
      """SELECT graft_tokenize('Hello, World!') AS toks,
        |       graft_tokenize('a b c d', 2) AS capped,
        |       graft_html_extract(cast('<p>Hi &amp; bye</p>' AS BINARY)) AS txt,
        |       graft_varint_decode(graft_varint_encode(array(1, 200, 70000))) AS rt,
        |       graft_delta_varint_decode(graft_delta_varint_encode(array(5L, 9L, 1000L))) AS drt
        |""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("hello", "world"))
    assert(r.getSeq[String](1) == Seq("a", "b"))
    assert(r.getString(2) == "Hi & bye")
    assert(r.getSeq[Int](3) == Seq(1, 200, 70000))
    assert(r.getSeq[Long](4) == Seq(5L, 9L, 1000L))
  }

  test("term_counts from SQL matches groupBy semantics") {
    val r = spark.sql(
      "SELECT graft_term_counts(graft_tokenize('b a b c a b')) AS tc").head()
    val tc = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getInt(1)))
    assert(tc == Seq(("a", 2), ("b", 3), ("c", 1)))
  }

  test("full BM25 top-k expressed in pure spark.sql matches the Scala engine") {
    val docs = Synthesizer.withDocIds(Synthesizer.pages(spark, 150, 3))
      .select(col("doc_id"), col("text"))
    docs.createOrReplaceTempView("sql_docs")
    val queries = Synthesizer.queries(spark, 10, 150)
    queries.createOrReplaceTempView("sql_queries")

    val sqlResult = spark.sql(
      """WITH toks AS (
        |  SELECT doc_id, graft_tokenize(text) AS toks FROM sql_docs
        |), tf AS (
        |  SELECT doc_id, size(toks) AS dl, e.term AS term, e.tf AS tf
        |  FROM toks LATERAL VIEW explode(graft_term_counts(toks)) AS e
        |), stats AS (
        |  SELECT count(DISTINCT doc_id) AS n_docs, avg(dl) AS avgdl
        |  FROM (SELECT DISTINCT doc_id, dl FROM tf)
        |), idf AS (
        |  SELECT term, ln((s.n_docs - count(*) + 0.5) / (count(*) + 0.5) + 1.0) AS idf
        |  FROM tf CROSS JOIN stats s GROUP BY term, s.n_docs
        |), qt AS (
        |  SELECT qid, term, count(*) AS qtf
        |  FROM (SELECT qid, explode(graft_tokenize(text, 32)) AS term FROM sql_queries)
        |  GROUP BY qid, term
        |), hits AS (
        |  SELECT qt.qid, tf.doc_id,
        |         struct(tf.term, qt.qtf * i.idf * (tf.tf * 1.9 /
        |           (tf.tf + 0.9 * (0.6 + 0.4 * tf.dl / s.avgdl))) AS partial) AS p
        |  FROM qt JOIN idf i ON i.term = qt.term
        |          JOIN tf ON tf.term = qt.term
        |          CROSS JOIN stats s
        |), scored AS (
        |  SELECT qid, doc_id,
        |         aggregate(sort_array(collect_list(p)), 0d, (acc, x) -> acc + x.partial) AS score
        |  FROM hits GROUP BY qid, doc_id
        |)
        |SELECT qid, doc_id, rank, round(score, 6) AS score FROM (
        |  SELECT qid, doc_id, score,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
        |  FROM scored) WHERE rank <= 10
        |""".stripMargin)
      .as[(Long, Long, Int, Double)].collect().toSet

    // stats aggregate in a different order in the SQL plan, so scores
    // agree to ~1 ulp, not bit-exactly — compare rounded (ranks identical)
    val scalaResult = Bm25Search
      .searchFull(queries, Bm25IndexTables.fromDocs(docs), 10)
      .select(col("qid"), col("doc_id"), col("rank"), round(col("score"), 6).as("score"))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(sqlResult == scalaResult)
  }
}
