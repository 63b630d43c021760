package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multimodal plumbing: the REAL byte-feature expression against
  * hand-computed values, and the stub decode/resize arithmetic. */
class MediaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def assets(texts: (Long, String)*) =
    texts.toDF("asset_id", "t")
      .select(col("asset_id"), encode(col("t"), "UTF-8").as("payload"))

  test("byteStats: hand-computed entropy and top-byte frequency") {
    val df = Media.byteStatsDf(assets(
      1L -> "aabb",   // two symbols, uniform → entropy 1 bit, top freq 0.5
      2L -> "aaaa",   // one symbol → entropy 0, top freq 1
      3L -> "abcd",   // four symbols uniform → entropy 2 bits, top freq 0.25
      4L -> ""))      // empty payload → all-zero features, no crash
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(df(1L)._1 - 1.0) < 1e-12 && df(1L)._2 == 0.5)
    assert(df(2L)._1 == 0.0 && df(2L)._2 == 1.0)
    assert(math.abs(df(3L)._1 - 2.0) < 1e-12 && df(3L)._2 == 0.25)
    assert(df(4L) == (0.0, 0.0))
  }

  test("resize kernel: hand-computed nearest-neighbor resample") {
    // 4×2 plane over "abcdefgh": rows "abcd" / "efgh"; 2×2 nearest takes
    // (0,0)→a, (0,2)→c, (1,0)→e, (1,2)→g
    val out = assets(1L -> "abcdefgh")
      .select(Media.resized(col("payload"), lit(4), lit(2), 2, 2).as("r"))
      .head.getAs[Array[Byte]](0)
    assert(new String(out, "UTF-8") == "aceg")
    // wrap: a 3-byte payload read as a 4×2 plane cycles abc → the
    // identity-size resample reproduces the wrapped plane itself
    val wrapped = assets(2L -> "abc")
      .select(Media.resized(col("payload"), lit(4), lit(2), 4, 2).as("r"))
      .head.getAs[Array[Byte]](0)
    assert(new String(wrapped, "UTF-8") == "abcabcab")
  }

  test("resize: stub-decode dims, exact scale factors, real resampled plane") {
    val a = assets(7L -> "x" * 100) // nb=100 → width 116, height (3100 % 480)+16
    val r = Media.resize(a, targetW = 224, targetH = 112).head
    val (w, h) = (100 % 640 + 16, (100L * 31 % 480 + 16).toInt)
    assert(r.getInt(1) == w && r.getInt(2) == h)
    assert(r.getInt(3) == 224 && r.getInt(4) == 112)
    assert(r.getDouble(5) == BigDecimal(224.0 / w)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(6) == BigDecimal(112.0 / h)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val plane = r.getAs[Array[Byte]](7)
    assert(plane.length == 224 * 112)
    assert(plane.forall(_ == 'x'.toByte)) // uniform source → uniform plane
    // empty payload → full-size ZERO plane (the oracle replays this as a
    // chr(0) source, so the contract must be exactly all-zero bytes)
    val empty = Media.resize(assets(8L -> ""), targetW = 64, targetH = 48)
      .head.getAs[Array[Byte]](7)
    assert(empty.length == 64 * 48 && empty.forall(_ == 0))
  }
}
