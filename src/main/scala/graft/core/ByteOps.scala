package graft.core

/** Little-endian byte gathering, pseudo-rotates, byte condensation and
  * 128-bit multiplication — the arithmetic substrate every hash kernel in
  * this engine shares.
  *
  * Semantics deliberately mirror the reference's utility layer
  * (`LongHashMethods.java:29-163` in sunnygleason/g414-hash) bit for bit,
  * including its quirks, because sketch bit positions depend on them:
  *
  *  - `rotateLong`/`rotateInt` use an *arithmetic* right shift, so they are
  *    not true rotations for negative inputs (`LongHashMethods.java:29-36`);
  *  - `gatherPartialLongLE` places the first four bytes in the *high* part
  *    of the result when 4 <= available < 8 (`LongHashMethods.java:78-99`);
  *  - `condenseBytesIntoInt` advances its bit position modulo 4 while
  *    folding through a long shift (`LongHashMethods.java:53-64`).
  */
object ByteOps {
  final val LongLoMask = 0x00000000ffffffffL

  /** Arithmetic-shift pseudo-rotate (reference `LongHashMethods.java:29-31`). */
  @inline def rotateLong(v: Long, bits: Int): Long =
    (v >> bits) | (v << (64 - bits))

  /** Arithmetic-shift pseudo-rotate (reference `LongHashMethods.java:34-36`). */
  @inline def rotateInt(v: Int, bits: Int): Int =
    (v >> bits) | (v << (32 - bits))

  /** Unsigned widening of an int to a long. */
  @inline def uintToLong(i: Int): Long = i.toLong & LongLoMask

  /** Read 4 bytes little-endian starting at `index`; the last byte is taken
    * signed into the top bits (reference `LongHashMethods.java:110-118`). */
  @inline def gatherIntLE(data: Array[Byte], index: Int): Int = {
    var i = data(index) & 0xff
    i |= (data(index + 1) & 0xff) << 8
    i |= (data(index + 2) & 0xff) << 16
    i |= data(index + 3) << 24
    i
  }

  /** Read up to 3 bytes little-endian (reference `LongHashMethods.java:124-135`). */
  @inline def gatherPartialIntLE(data: Array[Byte], index: Int, available: Int): Int = {
    var i = data(index) & 0xff
    if (available > 1) {
      i |= (data(index + 1) & 0xff) << 8
      if (available > 2) {
        i |= (data(index + 2) & 0xff) << 16
      }
    }
    i
  }

  /** Read 8 bytes little-endian (reference `LongHashMethods.java:67-72`). */
  @inline def gatherLongLE(data: Array[Byte], index: Int): Long =
    uintToLong(gatherIntLE(data, index)) | (gatherIntLE(data, index + 4).toLong << 32)

  /** Read 1..7 bytes; for >= 4 bytes the first word lands in the high bits
    * (reference `LongHashMethods.java:78-99` — layout preserved exactly). */
  def gatherPartialLongLE(data: Array[Byte], index: Int, available: Int): Long = {
    if (available >= 4) {
      var l = uintToLong(gatherIntLE(data, index))
      val rest = available - 4
      if (rest == 0) return l
      val i2 = gatherPartialIntLE(data, index + 4, rest)
      l <<= (rest << 3)
      l | i2.toLong
    } else {
      gatherPartialIntLE(data, index, available).toLong
    }
  }

  /** XOR-fold bytes into a long at a rotating 8-byte position
    * (reference `LongHashMethods.java:39-50`). */
  def condenseBytesIntoLong(representation: Array[Byte]): Long = {
    var seed = 0L
    var pos = 0
    var idx = 0
    while (idx < representation.length) {
      seed ^= representation(idx).toLong << (pos * 8)
      pos = (pos + 1) % 8
      idx += 1
    }
    seed
  }

  /** XOR-fold bytes into an int, position modulo 4 but folded through a long
    * shift exactly like the reference (`LongHashMethods.java:53-64`). */
  def condenseBytesIntoInt(representation: Array[Byte]): Int = {
    var seed = 0
    var pos = 0
    var idx = 0
    while (idx < representation.length) {
      val bLong = representation(idx).toLong << (pos * 8)
      seed = (seed ^ bLong).toInt
      pos = (pos + 1) % 4
      idx += 1
    }
    seed
  }

  /** Full signed 64x64 -> 128-bit product, layout (lo, hi).
    *
    * Unlike the reference's `multiply128_optimized`
    * (`LongHashMethods.java:138-151`, marked "FIXME: need to verify!"),
    * which drops the high halves of the cross products and therefore
    * disagrees with its own BigInteger oracle, this is exact — the CWow
    * kernel does NOT use this helper; it inlines the reference's folding
    * arithmetic verbatim because its hash values are contractual. */
  @inline def multiply128(a: Long, b: Long): (Long, Long) =
    (a * b, Math.multiplyHigh(a, b))

  /** Reference 128-bit product via BigInteger (`LongHashMethods.java:156-163`)
    * — kept as the differential-test oracle for `multiply128`. */
  def multiply128Exact(a: Long, b: Long): (Long, Long) = {
    val p = BigInt(a) * BigInt(b)
    ((p & BigInt("ffffffffffffffff", 16)).longValue, (p >> 64).longValue)
  }

  @inline def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
}
