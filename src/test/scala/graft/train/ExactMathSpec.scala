package graft.train

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The exact-arithmetic transcendental primitives (ExactMath): the
  * generated SQL, evaluated by Spark, must equal the driver replication
  * BIT-FOR-BIT — the same property the DuckDB oracle leans on (validated
  * there over 400k samples at authoring time) — and both must track libm
  * within the polynomials' truncation error. TrainingSpec pins the
  * composed loss chain; this spec pins each primitive in isolation so a
  * regression localizes. */
class ExactMathSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import ExactMath._

  private val rnd = new scala.util.Random(11)

  test("exp chain: Spark evaluation of the generated SQL == expExact, bitwise") {
    val xs = Seq.fill(2000)(math.floor(-rnd.nextDouble() * 40 * 10000) / 10000) ++
      Seq(0.0, -0.0001, -31.9999, -32.0, -39.5) // clamp edges
    var df = xs.toDF("x").withColumn("p", expr(expCoreSql(expReduceSql("x"))))
    (1 to ExpSquarings).foreach { _ => df = df.withColumn("p", expr(pow4Sql("p"))) }
    val out = df.select(col("x"), col("p")).collect()
    out.foreach { r =>
      val (x, p) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(p) ==
        java.lang.Double.doubleToLongBits(expExact(x)), s"x=$x")
      if (x > -30) // truncation bound; below the clamp region fidelity is moot
        assert(math.abs(p - math.exp(x)) <= 1e-12 * math.max(math.exp(x), 1e-300) + 1e-16,
          s"accuracy x=$x")
    }
  }

  test("ln chain: Spark evaluation of the generated SQL == lnExact, bitwise") {
    val zs = Seq.fill(2000) {
      val scale = Seq(1e-9, 0.1, 1.0, 10.0, 1000.0, 1000000.0)(rnd.nextInt(6))
      1.0 + rnd.nextDouble() * scale
    } ++ Seq(1.0, 2.0, 4.0, 1048575.9)
    val out = zs.toDF("z")
      .withColumn("k", expr(lnKSql("z")))
      .withColumn("m", expr(lnMSql("z")))
      .withColumn("w", expr("(m - 1)/(m + 1)"))
      .withColumn("u", expr("w*w"))
      .withColumn("l", expr(lnAssembleSql("k", "w", "u")))
      .select(col("z"), col("l")).collect()
    out.foreach { r =>
      val (z, l) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(l) ==
        java.lang.Double.doubleToLongBits(lnExact(z)), s"z=$z")
      assert(math.abs(l - math.log(z)) < 1e-12, s"accuracy z=$z")
    }
  }

  test("snap4: Spark evaluation == driver snap, bitwise; normalizes -0.0") {
    val xs = Seq.fill(2000)(math.floor((rnd.nextDouble() - 0.5) * 60 * 1e8) / 1e8) ++
      Seq(0.0, -0.0, 1.23455, -1.23455, 0.00004999, -1e-12)
    val out = xs.toDF("x").withColumn("s", expr(snap4Sql("x")))
      .select(col("x"), col("s")).collect()
    out.foreach { r =>
      val (x, s) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(s) ==
        java.lang.Double.doubleToLongBits(snap4(x)), s"x=$x")
    }
    // -0.0 and tiny negatives snap to +0.0: the driver's value hash must
    // never see a signed zero
    assert(java.lang.Double.doubleToLongBits(snap4(-0.0)) == 0L)
    assert(java.lang.Double.doubleToLongBits(snap4(-1e-12)) == 0L)
  }
}
