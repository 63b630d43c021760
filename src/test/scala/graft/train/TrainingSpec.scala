package graft.train

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.query.{Bm25IndexTables, Bm25Search}

/** Training-data assembly: length batching + reverse permutation,
  * triple selection, in-batch negative matrix, loss reductions. */
class TrainingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark merge join fast"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "spark merge"),
    (3L, "merge join"),
    (4L, "spark join merge sort"),
    (5L, "completely unrelated words here"),
    (6L, "spark spark spark"),
    (7L, "join the table"),
    (8L, "merge the stream"),
    (9L, "a b")).toDF("doc_id", "text")

  private lazy val index = Bm25IndexTables.fromDocs(docs)
  private lazy val queries = Seq((1L, "spark merge join"), (2L, "the fox")).toDF("qid", "text")

  test("lengthBatches: batches bounded, sorted by length, permutation restores order") {
    val out = Training.lengthBatches(docs, chunkSize = 8, bsize = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(out.length == 10)
    // batch sizes ≤ bsize
    val sizes = out.groupBy(_._3).map(_._2.length)
    assert(sizes.forall(_ <= 4))
    // within a chunk, traversal in (batch_id, pos_in_batch) order is
    // non-decreasing in dl (the _sort_by_length contract)
    val chunk0 = out.filter(_._1 < 8).sortBy(r => (r._3, r._4)).map(_._2)
    assert(chunk0.toSeq == chunk0.sorted.toSeq)
    // restore_pos is the position in doc_id order within the chunk
    val restore = out.filter(_._1 < 8).sortBy(_._1).map(_._5)
    assert(restore.toSeq == (0 until 8))
    // the permutation round-trips: restore_pos is a bijection per chunk
    assert(out.filter(_._1 >= 8).map(_._5).sorted.toSeq == Seq(0, 1))
  }

  test("triplesFromRanking: pos is best-ranked relevant, negs ranked non-relevant") {
    val ranking = Seq(
      // qid 1: docs 4 (rank 1), 0 (rank 2), 2 (rank 3), 3 (rank 4)
      (1L, 4L, 1, 9.0), (1L, 0L, 2, 8.0), (1L, 2L, 3, 5.0), (1L, 3L, 4, 4.0),
      // qid 2: no relevant doc in ranking → no triples
      (2L, 9L, 1, 1.0)).toDF("qid", "doc_id", "rank", "score")
    val qrels = Seq((1L, 0L), (1L, 4L), (2L, 1L)).toDF("qid", "doc_id")
    val t = Training.triplesFromRanking(ranking, qrels, nway = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(t.toSeq == Seq((1L, 0, 4L), (1L, 1, 2L), (1L, 2, 3L)))
  }

  test("inBatchScores: own negatives excluded, label on own positive, zero fill") {
    val triples = Seq(
      (1L, 0, 0L, 8.0), (1L, 1, 5L, 1.0),
      (2L, 0, 1L, 7.0), (2L, 1, 9L, 1.0)).toDF("qid", "way", "doc_id", "score")
    val ib = Training.inBatchScores(queries, triples, index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byPair = ib.map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    // 2 qids × 4 batch docs − 2 own negatives = 6 rows
    assert(ib.length == 6)
    assert(!byPair.contains((1L, 5L)) && !byPair.contains((2L, 9L)))
    assert(byPair((1L, 0L))._2 == 1 && byPair((2L, 1L))._2 == 1)
    // qid 2 ("the fox") shares no term with doc 0 ("spark merge join fast")
    assert(byPair((2L, 0L))._1 == 0.0 && byPair((2L, 0L))._2 == 0)
    // cross-pair scores match the engine's restricted search scores
    val full = Bm25Search.searchFull(queries, index, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    for (((q, d), (s, _)) <- byPair if s != 0.0)
      assert(math.abs(full((q, d)) - s) < 1e-9, s"pair ($q,$d)")
  }

  test("losses: CE/KL hand-check — KL zero when student equals teacher") {
    val nway = Seq(
      (1L, 0, 3.0, 3.0), (1L, 1, 1.0, 1.0),
      (2L, 0, 2.0, 4.0), (2L, 1, 2.0, 0.5)).toDF("qid", "way", "teacher", "student")
    val ib = Seq(
      (1L, 0L, 3.0, 1), (1L, 5L, 1.0, 0),
      (2L, 1L, 2.0, 1), (2L, 5L, 2.0, 0)).toDF("qid", "doc_id", "score", "label")
    val out = Training.losses(nway, ib)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    def softCe(pos: Double, all: Seq[Double]): Double = {
      val m = all.max; -(pos - m - math.log(all.map(x => math.exp(x - m)).sum))
    }
    // 1e-7 tolerance: the engine rounds every exp/ln output to an
    // 8-decimal grid (cross-engine hash stability), so losses sit within
    // ~n·1e-8 of the exact-math value
    assert(math.abs(out(1L)._1 - softCe(3.0, Seq(3.0, 1.0))) < 1e-7)
    assert(math.abs(out(1L)._2) < 1e-12) // teacher == student → KL = 0 exactly
    assert(out(2L)._2 > 0.0)             // diverging student → positive KL
    assert(math.abs(out(2L)._3 - softCe(2.0, Seq(2.0, 2.0))) < 1e-7)
    // CE with equal pos/neg scores = ln 2
    assert(math.abs(out(2L)._3 - math.log(2.0)) < 1e-7)
  }

  /** The cross-engine stability contract (VERDICT r3 #1): every
    * transcendental output is rounded to an 8-decimal grid, so ANY engine
    * implementing the spec folds bit-identical doubles through IEEE-exact
    * +,−,×,÷ only. Verified by replicating the spec'd arithmetic on the
    * driver and requiring BIT equality (==, no tolerance) — including for
    * inputs tuned so the loss lands essentially ON a …00005 boundary of
    * the final round(…, 4), where a single unrounded libm ulp used to
    * flip the 4th decimal. */
  test("losses are bit-stable on a …00005 rounding boundary") {
    def grid8(x: Double): Double =
      BigDecimal.valueOf(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    // spec'd ib_ce for scores (a rounded to 4, label on a) vs 0.0:
    // m = max(a, 0); z = Σ round8(exp(x − m)); loss = −(a − m − round8(ln z))
    def ibCe(a0: Double): Double = {
      val a = BigDecimal.valueOf(a0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val m = math.max(a, 0.0)
      val z = grid8(math.exp(a - m)) + grid8(math.exp(0.0 - m))
      -(a - m - grid8(math.log(z)))
    }
    // scan the 4-decimal input grid for the loss closest to a 0.00005
    // boundary — the adversarial case for the final round(…, 4)
    val aStar = (1 to 30000).map(_ / 10000.0)
      .minBy { a => val f = ibCe(a) * 10000.0; math.abs(f - math.floor(f) - 0.5) }
    val frac = { val f = ibCe(aStar) * 10000.0; math.abs(f - math.floor(f) - 0.5) }
    assert(frac < 1e-3, s"scan failed to land near a boundary: a=$aStar frac=$frac")
    val nway = Seq((1L, 0, aStar, aStar), (1L, 1, 0.0, 0.0))
      .toDF("qid", "way", "teacher", "student")
    val ib = Seq((1L, 0L, aStar, 1), (1L, 5L, 0.0, 0)).toDF("qid", "doc_id", "score", "label")
    val out = Training.losses(nway, ib).select(col("ib_ce"), col("ce_nway")).head
    // bit equality, not tolerance: the engine must produce EXACTLY the
    // spec'd double, or two engines will disagree after round(…, 4)
    assert(out.getDouble(0) == ibCe(aStar), s"ib_ce a=$aStar")
    assert(out.getDouble(1) == ibCe(aStar), s"ce_nway a=$aStar (same formula here)")
  }

  test("lengthBatches is identical across parallelism levels") {
    val a = Training.lengthBatches(docs.repartition(1), chunkSize = 8, bsize = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Training.lengthBatches(docs.repartition(7), chunkSize = 8, bsize = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
