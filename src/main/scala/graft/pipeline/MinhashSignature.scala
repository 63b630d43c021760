package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** array<string> shingles → array<string>[16] MinHash signature, as ONE
  * scalar pass (the SPIMI-style map-phase fusion, like TermCountsExpr):
  * per shingle compute 4 md5 digests (seed groups 0..3), slice each hex
  * into 4 8-char sub-hashes — 16 hash functions — and keep the running
  * lexicographic min per function. Semantics are engine-portable:
  * hash_i(s) = substr(md5((i/4) || '|' || s), (i%4)*8 + 1, 8), min as
  * string min — exactly what the DuckDB oracle computes.
  *
  * Why an expression and not HOFs: the declarative forms either explode
  * |shingles|×16 rows through a shuffle (relational min) or materialize
  * 16 intermediate arrays per doc (array_min over transform) — measured
  * 5-25× slower. Here each digest is computed once and compared in place;
  * empty input yields NULL (docs without shingles drop out upstream).
  *
  * Reference analog: the fused per-chunk signature computation inside the
  * encode loop (colbert/indexing/collection_indexer.py:346-356) — per-doc
  * work stays in the map phase.
  */
object MinhashSignature {
  def minhash_signature(c: Column): Column =
    GraftShim.column(MinhashSignatureExpr(GraftShim.expression(c)))

  /** array<string> shingles → array<struct<band:int, key:string>>[4] LSH
    * band keys, fully fused (signature + band digests in one pass). A
    * single plan reference — exposing the 16-min signature column and
    * re-slicing it 16× lets CollapseProject inline the signature
    * expression into every consumer and recompute it per reference. */
  def minhash_band_keys(c: Column): Column =
    GraftShim.column(MinhashBandKeysExpr(GraftShim.expression(c)))
}

case class MinhashBandKeysExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("key", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_keys"
  override def nullSafeEval(input: Any): Any =
    MinhashSignatureExpr.minhashBandsEval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.pipeline.MinhashSignatureExpr.minhashBandsEval($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinhashBandKeysExpr =
    copy(child = newChild)
}

case class MinhashSignatureExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    MinhashSignatureExpr.minhashSigEval(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen (not defineCodeGen): the result is null for empty
    // shingle arrays, which defineCodeGen's non-null contract would break
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.pipeline.MinhashSignatureExpr.minhashSigEval($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): MinhashSignatureExpr =
    copy(child = newChild)
}

object MinhashSignatureExpr {
  private val Fns = 16
  private val Bands = 4
  private val HexChars = "0123456789abcdef".toCharArray

  /** null for an empty shingle set, else the 4 LSH band keys
    * (band, md5(band || '|' || its 4 mins concatenated in i-order)). */
  def minhashBandsEval(arr: ArrayData): ArrayData = {
    val mins = minsOf(arr)
    if (mins == null) return null
    val md = Md5Scratch.get()
    val out = new Array[Any](Bands)
    var b = 0
    while (b < Bands) {
      md.reset()
      md.update(('0' + b).toByte)
      md.update('|'.toByte)
      var k = 0
      while (k < 4) {
        // the 8 hex chars are ASCII → 1 byte per char in UTF-8
        md.update(mins(b * 4 + k).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        k += 1
      }
      out(b) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, UTF8String.fromString(hex(md.digest()))))
      b += 1
    }
    new GenericArrayData(out)
  }

  private def hex(digest: Array[Byte]): String = {
    val cs = new Array[Char](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      val v = digest(i) & 0xff
      cs(i * 2) = HexChars(v >>> 4)
      cs(i * 2 + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(cs)
  }

  /** null for an empty shingle set (no signature), else the 16 mins. */
  def minhashSigEval(arr: ArrayData): ArrayData = {
    val mins = minsOf(arr)
    if (mins == null) return null
    val out = new Array[Any](Fns)
    var i = 0
    while (i < Fns) { out(i) = UTF8String.fromString(mins(i)); i += 1 }
    new GenericArrayData(out)
  }

  private def minsOf(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = Md5Scratch.get()
    val mins = new Array[String](Fns)
    val sub = new Array[Char](8)
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      var g = 0
      while (g < 4) {
        md.reset()
        md.update(('0' + g).toByte)
        md.update('|'.toByte)
        md.update(sBytes)
        val digest = md.digest() // 16 bytes → 32 hex chars
        var k = 0
        while (k < 4) {
          // hex of digest bytes [k*4, k*4+4) = chars [k*8, k*8+8)
          var b = 0
          while (b < 4) {
            val v = digest(k * 4 + b) & 0xff
            sub(b * 2) = HexChars(v >>> 4)
            sub(b * 2 + 1) = HexChars(v & 0xf)
            b += 1
          }
          val s = new String(sub)
          val fi = g * 4 + k
          if (mins(fi) == null || s.compareTo(mins(fi)) < 0) mins(fi) = s
          k += 1
        }
        g += 1
      }
      i += 1
    }
    mins
  }
}
