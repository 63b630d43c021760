package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Property-style codec round-trips (seeded generators — SURVEY §5 item 2;
  * mirrors the multi-chunk ≡ coalesced equality of index_coalesce_test.py). */
class VarintSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def genSortedIds(maxLen: Int): Array[Long] = {
    val n = rnd.nextInt(maxLen)
    val gaps = Array.fill(n)(1L + rnd.nextLong(1L << 40))
    gaps.scanLeft(0L)(_ + _).drop(1)
  }

  test("delta varint round-trips 300 random strictly-increasing id lists") {
    (1 to 300).foreach { _ =>
      val ids = genSortedIds(200)
      assert(Varint.deltaDecode(Varint.deltaEncode(ids)).sameElements(ids))
    }
  }

  test("varint round-trips 300 random non-negative int arrays") {
    (1 to 300).foreach { _ =>
      val xs = Array.fill(rnd.nextInt(200))(rnd.nextInt(Int.MaxValue))
      assert(Varint.decodeInts(Varint.encodeInts(xs)).sameElements(xs))
    }
  }

  test("edge cases: empty, single, Long.MaxValue-ish") {
    assert(Varint.deltaDecode(Varint.deltaEncode(Array.emptyLongArray)).isEmpty)
    assert(Varint.deltaDecode(Varint.deltaEncode(Array(0L))).sameElements(Array(0L)))
    val big = Array(1L, Long.MaxValue - 1)
    assert(Varint.deltaDecode(Varint.deltaEncode(big)).sameElements(big))
  }

  test("compression: dense ids take ~1 byte per entry") {
    val ids = (1000L to 10000L).toArray
    val enc = Varint.deltaEncode(ids)
    assert(enc.length <= ids.length + 2, s"got ${enc.length} bytes for ${ids.length} ids")
  }

  test("rejects non-increasing input") {
    intercept[IllegalArgumentException] {
      Varint.deltaEncode(Array(5L, 5L))
    }
  }

  test("expression round-trip inside a Catalyst plan") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import VarintExpressions._
    val df = Seq(Seq(3L, 9L, 10L, 500L), Seq(1L)).toDF("ids")
    val got = df.select(delta_varint_decode(delta_varint_encode(col("ids"))).as("back"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == Seq(Seq(3L, 9L, 10L, 500L), Seq(1L)))
  }
}
