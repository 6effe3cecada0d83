package graft.codec

/** Lossy compression of non-negative integers into a single byte, used for
  * BM25 norms (encoded field lengths).
  *
  * Semantics mirror Lucene's `SmallFloat.intToByte4`/`byte4ToInt`
  * (reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169):
  * values below `NUM_FREE_VALUES` (= 24) are exact; above that, a 4-significant-bit
  * floor encoding (3-bit mantissa + implicit leading bit + shift). Net effect:
  * exact for lengths < 40, monotonic lossy floor above.
  */
object SmallFloat {

  /** Encode a non-negative long keeping only 4 significant bits. */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"Only supports positive values, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) {
      i.toInt // subnormal value
    } else {
      val shift = numBits - 4
      var encoded = (i >>> shift).toInt
      encoded &= 0x07                 // clear the implicit most-significant bit
      encoded |= (shift + 1) << 3     // 0 shift is reserved for subnormals
      encoded
    }
  }

  def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits // subnormal
    else (bits | 0x08L) << shift
  }

  private val MAX_INT4: Int = longToInt4(Int.MaxValue.toLong)
  val NUM_FREE_VALUES: Int = 255 - MAX_INT4

  /** Encode a non-negative int into a single byte; exact if < NUM_FREE_VALUES + 16. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"Only supports positive values, got $i")
    if (i < NUM_FREE_VALUES) i.toByte
    else (NUM_FREE_VALUES + longToInt4((i - NUM_FREE_VALUES).toLong)).toByte
  }

  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NUM_FREE_VALUES) i
    else {
      val decoded = NUM_FREE_VALUES + int4ToLong(i - NUM_FREE_VALUES)
      Math.toIntExact(decoded)
    }
  }
}
