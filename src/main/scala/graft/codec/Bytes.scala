package graft.codec

/** Growable byte buffer with VInt/VLong support (LEB128-style, low 7 bits
  * per byte, high bit = continuation — same wire idea as Lucene's
  * `DataOutput.writeVInt`). */
final class ByteWriter(initial: Int = 64) {
  private var buf = new Array[Byte](initial)
  private var len = 0

  @inline private def ensure(n: Int): Unit = {
    if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def writeBytes(bs: Array[Byte]): Unit = { ensure(bs.length); System.arraycopy(bs, 0, buf, len, bs.length); len += bs.length }

  def writeVInt(v0: Int): Unit = {
    var v = v0
    ensure(5)
    while ((v & ~0x7F) != 0) { buf(len) = ((v & 0x7F) | 0x80).toByte; len += 1; v >>>= 7 }
    buf(len) = v.toByte; len += 1
  }

  def writeVLong(v0: Long): Unit = {
    var v = v0
    ensure(10)
    while ((v & ~0x7FL) != 0) { buf(len) = ((v & 0x7F) | 0x80).toByte; len += 1; v >>>= 7 }
    buf(len) = v.toByte; len += 1
  }

  def size: Int = len
  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

final class ByteReader(bytes: Array[Byte], var pos: Int = 0) {
  def readByte(): Int = { val b = bytes(pos) & 0xFF; pos += 1; b }

  def readVInt(): Int = {
    var b = readByte(); var v = b & 0x7F; var shift = 7
    while ((b & 0x80) != 0) { b = readByte(); v |= (b & 0x7F) << shift; shift += 7 }
    v
  }

  def readVLong(): Long = {
    var b = readByte(); var v = (b & 0x7FL); var shift = 7
    while ((b & 0x80) != 0) { b = readByte(); v |= (b & 0x7FL) << shift; shift += 7 }
    v
  }

  def remaining: Int = bytes.length - pos
}

/** Fixed-width bit packing of int arrays (any count), the scalar analog of
  * Lucene's `ForUtil` 128-int SIMD packer
  * (reference: lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForUtil.java:26-1128).
  * We keep the semantics (fixed bits-per-value, block codec building block),
  * not the byte layout — storage here is Parquet binary columns, not index files.
  */
object Packing {

  def bitsRequired(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v | 1)

  /** Pack `count` values at `bits` bits each into bytes (MSB-first stream). */
  def pack(values: Array[Int], count: Int, bits: Int, w: ByteWriter): Unit = {
    require(bits >= 1 && bits <= 32)
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < count) {
      acc = (acc << bits) | (values(i) & ((1L << bits) - 1))
      accBits += bits
      while (accBits >= 8) {
        accBits -= 8
        w.writeByte(((acc >>> accBits) & 0xFF).toInt)
      }
      i += 1
    }
    if (accBits > 0) w.writeByte(((acc << (8 - accBits)) & 0xFF).toInt)
  }

  /** Unpack `count` values at `bits` bits each. */
  def unpack(r: ByteReader, count: Int, bits: Int, out: Array[Int], outOff: Int): Unit = {
    var acc = 0L
    var accBits = 0
    var i = 0
    val mask = (1L << bits) - 1
    while (i < count) {
      while (accBits < bits) { acc = (acc << 8) | r.readByte(); accBits += 8 }
      accBits -= bits
      out(outOff + i) = ((acc >>> accBits) & mask).toInt
      i += 1
    }
  }
}
