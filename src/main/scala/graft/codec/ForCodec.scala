package graft.codec

/** Patched Frame-of-Reference codec for freq/position blocks.
  *
  * Semantics mirror Lucene's `PForUtil`
  * (reference: lucene/core/src/java/org/apache/lucene/codecs/lucene84/PForUtil.java:49-116):
  *  - token byte = (numExceptions << 5) | bitsPerValue
  *  - at most 3 exceptions, stored as (index, highBits) byte pairs where
  *    highBits = value >>> bitsPerValue must fit in 8 bits
  *  - all-equal block short-circuits to bits=0 + single VInt
  */
object PForUtil {
  val MAX_EXCEPTIONS = 3

  def encode(values: Array[Int], count: Int, w: ByteWriter): Unit = {
    require(count > 0 && count <= 256)
    var allEqual = true
    var i = 1
    while (i < count && allEqual) { if (values(i) != values(0)) allEqual = false; i += 1 }
    if (allEqual) {
      w.writeByte(0) // bits=0, 0 exceptions
      w.writeVInt(values(0))
      return
    }
    // histogram of bits required
    var maxBits = 0
    i = 0
    while (i < count) { val b = Packing.bitsRequired(values(i)); if (b > maxBits) maxBits = b; i += 1 }
    // try to shrink bits while <= MAX_EXCEPTIONS values exceed and their
    // high parts fit in one byte
    var bits = maxBits
    var best = maxBits
    var bestExc: List[Int] = Nil
    var done = false
    while (!done && bits > 1) {
      bits -= 1
      var exc: List[Int] = Nil
      var nExc = 0
      var ok = true
      i = 0
      while (i < count && ok) {
        if (Packing.bitsRequired(values(i)) > bits) {
          nExc += 1
          if (nExc > MAX_EXCEPTIONS || (values(i) >>> bits) > 0xFF) ok = false
          else exc = i :: exc
        }
        i += 1
      }
      if (ok) { best = bits; bestExc = exc }
      else done = true
    }
    val excIdx = bestExc.reverse.toArray
    w.writeByte((excIdx.length << 5) | best)
    // pack low `best` bits of every value
    val low = new Array[Int](count)
    i = 0
    while (i < count) { low(i) = values(i) & ((1 << best) - 1).toInt; i += 1 }
    if (best == 32) { i = 0; while (i < count) { low(i) = values(i); i += 1 } }
    Packing.pack(low, count, best, w)
    // exceptions: (index, highBits)
    i = 0
    while (i < excIdx.length) {
      w.writeByte(excIdx(i))
      w.writeByte(values(excIdx(i)) >>> best)
      i += 1
    }
  }

  def decode(r: ByteReader, count: Int, out: Array[Int]): Unit = {
    val token = r.readByte()
    val bits = token & 0x1F
    val nExc = token >>> 5
    if (bits == 0) {
      val v = r.readVInt()
      java.util.Arrays.fill(out, 0, count, v)
    } else {
      Packing.unpack(r, count, bits, out, 0)
      var i = 0
      while (i < nExc) {
        val idx = r.readByte()
        val high = r.readByte()
        out(idx) |= high << bits
        i += 1
      }
    }
  }
}

/** Delta codec for strictly-increasing doc ids within a block.
  *
  * Semantics mirror Lucene's `ForDeltaUtil`
  * (reference: lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForDeltaUtil.java:56-82):
  * all-deltas==1 collapses to a single 0 byte; otherwise a bits byte +
  * fixed-width packed deltas. A third branch (flag 2) VLong-encodes deltas
  * that overflow Int — possible for sparse terms in a very large doc space.
  */
object ForDeltaUtil {

  /** Encode `count` strictly increasing docIds relative to `base`
    * (base = docId just before the block, exclusive). */
  def encode(docIds: Array[Long], count: Int, base: Long, w: ByteWriter): Unit = {
    var allOne = true
    var maxDelta = 0L
    var prev = base
    var i = 0
    while (i < count) {
      val d = docIds(i) - prev
      require(d > 0, s"docIds must be strictly increasing: ${docIds(i)} after $prev")
      if (d != 1L) allOne = false
      if (d > maxDelta) maxDelta = d
      prev = docIds(i)
      i += 1
    }
    if (allOne) { w.writeByte(0); return }
    if (maxDelta <= Int.MaxValue) {
      val deltas = new Array[Int](count)
      prev = base
      i = 0
      while (i < count) { deltas(i) = (docIds(i) - prev).toInt; prev = docIds(i); i += 1 }
      var bits = 0
      i = 0
      while (i < count) { val b = Packing.bitsRequired(deltas(i)); if (b > bits) bits = b; i += 1 }
      w.writeByte(1)
      w.writeByte(bits)
      Packing.pack(deltas, count, bits, w)
    } else {
      w.writeByte(2)
      prev = base
      i = 0
      while (i < count) { w.writeVLong(docIds(i) - prev); prev = docIds(i); i += 1 }
    }
  }

  def decode(r: ByteReader, count: Int, base: Long, out: Array[Long]): Unit = {
    val flag = r.readByte()
    var prev = base
    flag match {
      case 0 =>
        var i = 0
        while (i < count) { prev += 1; out(i) = prev; i += 1 }
      case 1 =>
        val bits = r.readByte()
        val deltas = new Array[Int](count)
        Packing.unpack(r, count, bits, deltas, 0)
        var i = 0
        while (i < count) { prev += deltas(i); out(i) = prev; i += 1 }
      case 2 =>
        var i = 0
        while (i < count) { prev += r.readVLong(); out(i) = prev; i += 1 }
    }
  }
}
