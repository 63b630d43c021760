package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** (entries: array<struct<doc_id,tf,dl>>, avgdl: double) →
  * struct<n:int, doc_ids_enc:binary, tfs_enc:binary, dls_enc:binary,
  * block_max_tfnorm:double> — the whole posting-block encode as ONE fused
  * pass: sort by docId, delta+varint the ids, varint tf/dl, and compute
  * the block-max WAND bound, all over primitive arrays.
  *
  * Replaces a sort_array(array<struct>) + three transform() passes + three
  * varint expressions + a separate max() aggregate — measured the
  * dominant allocation source of the blocks stage (reference analog: the
  * fused residual compress kernel, colbert/indexing/codecs/residual.py
  * :167-202).
  */
object BlockEncode {
  def block_encode(entries: Column, avgdl: Column, k1: Double, b: Double): Column =
    GraftShim.column(BlockEncodeExpr(
      GraftShim.expression(entries), GraftShim.expression(avgdl), k1, b))

  /** The blocks-stage aggregation and the block encode FUSED into one
    * Catalyst aggregate (see [[BlockEncodeAggExpr]]). avgdl must be a
    * driver value — the persisted build has it from the corpusstats
    * stage; lazy in-memory builds keep the collect_list route. */
  def block_encode_agg(docId: Column, tf: Column, dl: Column,
                       avgdl: Double, k1: Double, b: Double): Column =
    GraftShim.column(BlockEncodeAggExpr(
      GraftShim.expression(docId), GraftShim.expression(tf), GraftShim.expression(dl),
      avgdl, k1, b).toAggregateExpression())
}

case class BlockEncodeExpr(left: Expression, right: Expression, k1: Double, b: Double)
    extends BinaryExpression {

  override def dataType: DataType = BlockEncodeExpr.OutType

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "block_encode"

  override def nullSafeEval(entries: Any, avgdl: Any): Any =
    BlockEncodeExpr.blockEncodeEval(
      entries.asInstanceOf[ArrayData], avgdl.asInstanceOf[Double], k1, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, a) =>
      s"graft.codec.BlockEncodeExpr.blockEncodeEval($e, $a, $k1, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BlockEncodeExpr =
    copy(left = newLeft, right = newRight)
}

object BlockEncodeExpr {
  val OutType: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("doc_ids_enc", BinaryType, nullable = false),
    StructField("tfs_enc", BinaryType, nullable = false),
    StructField("dls_enc", BinaryType, nullable = false),
    StructField("block_max_tfnorm", DoubleType, nullable = false)))

  def blockEncodeEval(entries: ArrayData, avgdl: Double, k1: Double, b: Double): GenericInternalRow = {
    val n = entries.numElements()
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    var i = 0
    while (i < n) {
      val row = entries.getStruct(i, 3)
      docIds(i) = row.getLong(0)
      tfs(i) = row.getInt(1)
      dls(i) = row.getInt(2)
      i += 1
    }
    encodeArrays(docIds, tfs, dls, n, avgdl, k1, b)
  }

  /** Shared core of the expression and the aggregate: sort the first `n`
    * entries by docId, delta+varint encode, compute the block-max bound.
    * Arrays may be longer than n (the aggregate's growable buffers). */
  def encodeArrays(docIds: Array[Long], tfs: Array[Int], dls: Array[Int], n: Int,
                   avgdl: Double, k1: Double, b: Double): GenericInternalRow = {
    var minId = Long.MaxValue
    var i = 0
    while (i < n) { if (docIds(i) < minId) minId = docIds(i); i += 1 }
    // order by docId: pack (relId, idx) into one long — relIds within a
    // block are bounded by blockSpan, so rel*(n+1)+idx never collides
    val packed = new Array[Long](n)
    i = 0
    while (i < n) { packed(i) = (docIds(i) - minId) * (n + 1L) + i; i += 1 }
    java.util.Arrays.sort(packed)

    val sIds = new Array[Long](n)
    val sTfs = new Array[Int](n)
    val sDls = new Array[Int](n)
    var maxTfnorm = 0.0
    i = 0
    while (i < n) {
      val idx = (packed(i) % (n + 1L)).toInt
      sIds(i) = docIds(idx)
      sTfs(i) = tfs(idx)
      sDls(i) = dls(idx)
      val tf = tfs(idx).toDouble
      val tfnorm = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dls(idx) / avgdl))
      if (tfnorm > maxTfnorm) maxTfnorm = tfnorm
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n, Varint.deltaEncode(sIds), Varint.encodeInts(sTfs), Varint.encodeInts(sDls),
      maxTfnorm))
  }
}

/** Growable primitive-array posting buffer for [[BlockEncodeAggExpr]] —
  * ~16 B per posting vs the ~60-80 B per buffered UnsafeRow struct that
  * collect_list holds, and zero per-element object headers for the GC to
  * trace. */
final class PostingsBuf(var ids: Array[Long], var tfs: Array[Int],
                        var dls: Array[Int], var n: Int) {
  def this() = this(new Array[Long](16), new Array[Int](16), new Array[Int](16), 0)

  private def ensure(cap: Int): Unit =
    if (cap > ids.length) {
      val newCap = math.max(cap, ids.length * 2)
      ids = java.util.Arrays.copyOf(ids, newCap)
      tfs = java.util.Arrays.copyOf(tfs, newCap)
      dls = java.util.Arrays.copyOf(dls, newCap)
    }

  def append(id: Long, tf: Int, dl: Int): Unit = {
    ensure(n + 1)
    ids(n) = id; tfs(n) = tf; dls(n) = dl; n += 1
  }

  def appendAll(o: PostingsBuf): Unit = {
    ensure(n + o.n)
    System.arraycopy(o.ids, 0, ids, n, o.n)
    System.arraycopy(o.tfs, 0, tfs, n, o.n)
    System.arraycopy(o.dls, 0, dls, n, o.n)
    n += o.n
  }
}

/** The blocks-stage `collect_list(struct(...))` + [[BlockEncodeExpr]]
  * FUSED into one TypedImperativeAggregate: postings accumulate straight
  * into primitive arrays (no per-element row objects), partial buffers
  * cross the shuffle as varint bytes (~3× smaller than the UnsafeRow
  * list), and eval() emits the finished encoded block. The aggregation
  * tree (partial map-side → shuffle → final merge) is untouched — only
  * the buffer representation changes, so results are bit-identical to
  * the two-step route (property-tested in CodecSpec, plus the
  * parallelism-identity build tests).
  *
  * avgdl/k1/b are build-time constants (the persisted build reads avgdl
  * from the one-row corpusstats stage before planning blocks). */
case class BlockEncodeAggExpr(first: Expression, second: Expression, third: Expression,
                              avgdl: Double, k1: Double, b: Double,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PostingsBuf] with TernaryLike[Expression] {

  override def prettyName: String = "block_encode_agg"
  override def dataType: DataType = BlockEncodeExpr.OutType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): PostingsBuf = new PostingsBuf()

  override def update(buf: PostingsBuf, input: InternalRow): PostingsBuf = {
    buf.append(
      first.eval(input).asInstanceOf[Long],
      second.eval(input).asInstanceOf[Int],
      third.eval(input).asInstanceOf[Int])
    buf
  }

  override def merge(buf: PostingsBuf, other: PostingsBuf): PostingsBuf = {
    buf.appendAll(other)
    buf
  }

  override def eval(buf: PostingsBuf): Any =
    BlockEncodeExpr.encodeArrays(buf.ids, buf.tfs, buf.dls, buf.n, avgdl, k1, b)

  /** Shuffle format: varint(n), varint(ids — raw, NOT delta: partials are
    * unsorted), varint(tfs), varint(dls). */
  override def serialize(buf: PostingsBuf): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(buf.n * 4 + 8)
    writeVarLong(out, buf.n.toLong)
    var i = 0
    while (i < buf.n) { writeVarLong(out, buf.ids(i)); i += 1 }
    i = 0
    while (i < buf.n) { writeVarLong(out, buf.tfs(i).toLong); i += 1 }
    i = 0
    while (i < buf.n) { writeVarLong(out, buf.dls(i).toLong); i += 1 }
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PostingsBuf = {
    val pos = new Array[Int](1)
    val n = readVarLong(bytes, pos).toInt
    val buf = new PostingsBuf(new Array[Long](math.max(n, 1)),
      new Array[Int](math.max(n, 1)), new Array[Int](math.max(n, 1)), n)
    var i = 0
    while (i < n) { buf.ids(i) = readVarLong(bytes, pos); i += 1 }
    i = 0
    while (i < n) { buf.tfs(i) = readVarLong(bytes, pos).toInt; i += 1 }
    i = 0
    while (i < n) { buf.dls(i) = readVarLong(bytes, pos).toInt; i += 1 }
    buf
  }

  private def writeVarLong(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def readVarLong(bytes: Array[Byte], pos: Array[Int]): Long = {
    var v = 0L; var shift = 0; var b0 = 0
    do {
      b0 = bytes(pos(0)) & 0xff
      v |= (b0 & 0x7fL) << shift
      shift += 7
      pos(0) += 1
    } while ((b0 & 0x80) != 0)
    v
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BlockEncodeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BlockEncodeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BlockEncodeAggExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
