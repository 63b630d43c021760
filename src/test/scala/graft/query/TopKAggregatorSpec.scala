package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap aggregate's algebra: update/merge must be associative
  * and order-insensitive (Spark may merge partial buffers in any
  * order/grouping), and the final result must equal a full sort — with a
  * serialize/deserialize round-trip on every partial buffer, exactly as
  * the shuffle applies it. Randomized over 200 partition layouts. */
class TopKAggregatorSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(23)

  private def roundTrip(b: TopKBuf): TopKBuf = {
    // the same byte format HeapTopKAggExpr ships across the shuffle
    val agg = HeapTopKAggExpr(null, null, b.k)
    agg.deserialize(agg.serialize(b))
  }

  private def run(k: Int, entries: Seq[(Long, Double)], splits: Int): Seq[(Long, Double)] = {
    // random partition of the input into `splits` buffers
    val parts = entries.groupBy(_ => rnd.nextInt(splits)).values.toSeq
    val bufs = parts.map { p =>
      val b = new TopKBuf(k)
      p.foreach { case (id, s) => b.append(id, s) }
      roundTrip(b)
    }
    // random-order pairwise merges
    val merged = rnd.shuffle(bufs).reduceOption { (a, b) => a.appendAll(b); a }
      .getOrElse(new TopKBuf(k))
    merged.result().toSeq
  }

  test("200 random layouts: top-k ≡ exhaustive sort, regardless of partitioning") {
    (1 to 200).foreach { i =>
      val n = rnd.nextInt(300)
      val k = 1 + rnd.nextInt(20)
      // duplicate scores on purpose → exercises docId tiebreak
      val entries = (0 until n).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(10).toDouble))
        .distinct
      val want = entries.sortBy { case (id, s) => (-s, id) }.take(k)
      val got = run(k, rnd.shuffle(entries), 1 + rnd.nextInt(8))
      assert(got == want, s"case $i: k=$k n=${entries.size}")
    }
  }
}
