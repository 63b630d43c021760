package graft.codec

/** LEB128-style unsigned varint + delta coding for posting lists.
  *
  * Lexical analog of the reference's residual quantize/bit-pack codec
  * (reference: colbert/indexing/codecs/residual.py:186-202 and
  * packbits.cu): docID posting lists are stored as delta-encoded gaps,
  * term frequencies / doc lengths as plain varints, giving ~1-2 bytes
  * per posting entry instead of 8+4+4.
  */
object Varint {

  def encodeLongs(values: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(values.length * 2 + 8)
    var i = 0
    while (i < values.length) {
      var v = values(i)
      require(v >= 0, s"varint requires non-negative value, got $v")
      while ((v & ~0x7fL) != 0L) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
      i += 1
    }
    out.toByteArray
  }

  def decodeLongs(bytes: Array[Byte]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](bytes.length)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(i) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        i += 1
      } while ((b & 0x80) != 0)
      out += v
    }
    out.toArray
  }

  def encodeInts(values: Array[Int]): Array[Byte] =
    encodeLongs(values.map(_.toLong))

  def decodeInts(bytes: Array[Byte]): Array[Int] =
    decodeLongs(bytes).map(_.toInt)

  /** Delta-encode a strictly increasing id list, then varint. First value
    * absolute, rest are gaps (≥1). */
  def deltaEncode(sortedIds: Array[Long]): Array[Byte] = {
    if (sortedIds.isEmpty) return Array.emptyByteArray
    val gaps = new Array[Long](sortedIds.length)
    gaps(0) = sortedIds(0)
    var i = 1
    while (i < sortedIds.length) {
      val g = sortedIds(i) - sortedIds(i - 1)
      require(g > 0, s"ids must be strictly increasing: ${sortedIds(i - 1)} -> ${sortedIds(i)}")
      gaps(i) = g
      i += 1
    }
    encodeLongs(gaps)
  }

  def deltaDecode(bytes: Array[Byte]): Array[Long] = {
    val gaps = decodeLongs(bytes)
    var i = 1
    while (i < gaps.length) { gaps(i) += gaps(i - 1); i += 1 }
    gaps
  }
}
