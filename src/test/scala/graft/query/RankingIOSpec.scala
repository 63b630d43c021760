package graft.query

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.analysis.Passages

/** Ranking TSV round-trip (reference data/ranking.py:63-81 contract),
  * queries/qrels TSV scans with their asserts (loaders.py:15-56), and
  * docs→passages segmentation invariants (docs2passages.py:19-53). */
class RankingIOSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ranking TSV round-trips with .meta sidecar") {
    val dir = Files.createTempDirectory("graft-rank").toString
    val ranking = Seq(
      (1L, 10L, 1, 3.5), (1L, 20L, 2, 2.5), (2L, 30L, 1, 9.0))
      .toDF("qid", "doc_id", "rank", "score")
    RankingIO.writeRanking(ranking, dir, Map("index" -> "test-index"))
    assert(Files.exists(java.nio.file.Paths.get(dir, "_ranking.meta")))
    val back = RankingIO.readRanking(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(back == Set((1L, 10L, 1, 3.5), (1L, 20L, 2, 2.5), (2L, 30L, 1, 9.0)))
  }

  test("queries TSV scan rejects duplicate qids") {
    val dir = Files.createTempDirectory("graft-q").toString
    Files.writeString(java.nio.file.Paths.get(dir, "q.tsv"), "1\thello\n1\tworld\n")
    intercept[IllegalArgumentException] {
      RankingIO.readQueriesTsv(spark, s"$dir/q.tsv")
    }
  }

  test("qrels TSV scan dedups (qid, doc_id)") {
    val dir = Files.createTempDirectory("graft-qr").toString
    Files.writeString(java.nio.file.Paths.get(dir, "qrels.tsv"),
      "1\t0\t5\t1\n1\t0\t5\t1\n1\t0\t6\t1\n")
    val q = RankingIO.readQrelsTsv(spark, s"$dir/qrels.tsv")
      .as[(Long, Long)].collect().toSet
    assert(q == Set((1L, 5L), (1L, 6L)))
  }

  test("JSONL queries scan (QA rows)") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Paths.get(dir, "q.jsonl"),
      """{"qid": 1, "question": "hello world"}
        |{"qid": 2, "text": "foo bar"}
        |""".stripMargin)
    val q = RankingIO.readQueriesJsonl(spark, s"$dir/q.jsonl")
      .as[(Long, String)].collect().toSet
    assert(q == Set((1L, "hello world"), (2L, "foo bar")))
  }

  test("docId translate remaps through a mapping table") {
    val ranking = Seq((1L, 10L, 1, 3.5), (1L, 20L, 2, 2.5))
      .toDF("qid", "doc_id", "rank", "score")
    val mapping = Seq((10L, 110L), (20L, 120L)).toDF("doc_id", "new_doc_id")
    val got = RankingIO.translate(ranking, mapping)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == Set((1L, 110L, 1, 3.5), (1L, 120L, 2, 2.5)))
  }

  test("splitByQueries routes each ranking row to its qid's set; asserts kept") {
    val ranking = Seq(
      (1L, 10L, 1, 3.5), (1L, 20L, 2, 2.5),
      (2L, 30L, 1, 9.0), (3L, 40L, 1, 1.0))
      .toDF("qid", "doc_id", "rank", "score")
    val setA = Seq((1L, "qa"), (3L, "qc")).toDF("qid", "text")
    val setB = Seq((2L, "qb")).toDF("qid", "text")
    val Seq(a, b) = RankingIO.splitByQueries(ranking, Seq(setA, setB))
    assert(a.as[(Long, Long, Int, Double)].collect().toSet ==
      Set((1L, 10L, 1, 3.5), (1L, 20L, 2, 2.5), (3L, 40L, 1, 1.0)))
    assert(b.as[(Long, Long, Int, Double)].collect().toSet == Set((2L, 30L, 1, 9.0)))
    // a qid claimed by two sets is an error (reference's file_idx assert)
    intercept[IllegalArgumentException] {
      RankingIO.splitByQueries(ranking, Seq(setA, setA))
    }
    // a ranking qid covered by no set is an error (KeyError analog)
    intercept[IllegalArgumentException] {
      RankingIO.splitByQueries(ranking, Seq(setA))
    }
  }

  test("withSplitByQueries releases the shared persisted frame after use") {
    val ranking = Seq((1L, 10L, 1, 3.5), (2L, 30L, 1, 9.0))
      .toDF("qid", "doc_id", "rank", "score")
    val sets = Seq(Seq((1L, "qa")).toDF("qid", "text"), Seq((2L, "qb")).toDF("qid", "text"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = RankingIO.withSplitByQueries(ranking, sets) { splits =>
      splits.map(_.as[(Long, Long, Int, Double)].collect().toSet)
    }
    assert(got == Seq(Set((1L, 10L, 1, 3.5)), Set((2L, 30L, 1, 9.0))))
    // unpersist is async (blocking=false): poll briefly for the release
    val deadline = System.nanoTime() + 10_000_000_000L
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"routed frame still persisted: $leaked")
  }

  test("df-pruned search drops stopword-grade terms but keeps rare-term results") {
    import graft.analysis.Tokenizer
    import graft.corpus.Synthesizer
    val docs = Synthesizer.withDocIds(Synthesizer.pages(spark, 200, 3))
      .select(col("doc_id"), col("text"))
    val index = Bm25IndexTables.fromDocs(docs)
    // plant7 occurs in one doc; w0 is stopword-grade
    val queries = Seq((1L, "plant7 w0")).toDF("qid", "text")
    val full = Bm25Search.searchFull(queries, index, 5)
    val pruned = Bm25Search.searchFull(queries, Bm25Search.dfPruned(index, 0.05), 5)
    // the rare planted term still hits its doc (docIds are url-rank, so
    // find the doc by content)
    val plantedId = docs
      .filter(array_contains(Tokenizer.tokenizeDoc(col("text")), "plant7"))
      .select(col("doc_id")).as[Long].head()
    assert(pruned.filter(col("doc_id") === plantedId).count() == 1)
    // pruned scores exclude the stopword contribution -> strictly fewer or
    // different hits than full for this query
    assert(pruned.count() <= full.count())
  }

  test("tokenize_with_offsets emits exact char spans") {
    import graft.analysis.Tokenizer
    val rows = Seq("Hello, World!", "a—b  c").toDF("text")
      .select(Tokenizer.tokenize_with_offsets(col("text")).as("t"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getString(0), r.getInt(1), r.getInt(2))).toList).toList
    assert(rows(0) == List(("hello", 0, 5), ("world", 7, 12)))
    assert(rows(1) == List(("a", 0, 1), ("b", 2, 3), ("c", 5, 6)))
    // spans index the ORIGINAL text (lowercase applies to term only)
    assert("Hello, World!".substring(7, 12) == "World")
  }

  test("passages cover every token with the configured overlap") {
    val docs = Seq(
      (1L, (1 to 150).map(i => s"t$i").mkString(" ")), // 150 tokens → 64/32 windows
      (2L, "a b c")) // shorter than window → single passage
      .toDF("doc_id", "text")
    val ps = Passages.segment(docs, window = 64, overlap = 32)
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    val p1 = ps.filter(_._1 == 1L)
    // starts 1, 33, 65, 97 (start 129 would add no uncovered tokens:
    // ceil((150-64)/32)+1 = 4 windows); last covers 97..150 = 54 tokens
    assert(p1.length == 4 && p1.last._4 == 54)
    assert(p1.head._3.startsWith("t1 t2 ") && p1.head._4 == 64)
    // consecutive windows overlap by 32 tokens
    val w0 = p1(0)._3.split(" "); val w1 = p1(1)._3.split(" ")
    assert(w0.takeRight(32).toSeq == w1.take(32).toSeq)
    // union of window tokens == all 150 tokens
    assert(p1.flatMap(_._3.split(" ")).toSet == (1 to 150).map(i => s"t$i").toSet)
    val p2 = ps.filter(_._1 == 2L)
    assert(p2.length == 1 && p2.head._3 == "a b c" && p2.head._4 == 3)
  }
}
