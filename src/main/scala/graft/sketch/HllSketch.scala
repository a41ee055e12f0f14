package graft.sketch

import java.nio.ByteBuffer

import graft.core.ByteOps
import graft.core.hash.{HashKernel64, HashKernels}

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier
  * 2007) over this engine's 64-bit hash kernels: m = 2^p byte registers,
  * register j = max rank (leading-zero count + 1) of hashed values whose
  * top p bits select j. Standard error sigma = 1.04 / sqrt(m).
  *
  * With a 64-bit hash the large-range collision correction of the 32-bit
  * original is unnecessary; the small-range regime uses linear counting.
  * Merge = element-wise register max — associative, commutative,
  * idempotent, so partial aggregates combine identically regardless of
  * partition order (the reference's `putAll` contract,
  * `BloomFilter.java:198-207`, generalized).
  */
final class HllSketch private (
    val kernel: HashKernel64,
    val p: Int,
    private val registers: Array[Byte]) extends Serializable {

  import HllSketch._

  val m: Int = 1 << p

  def update(data: Array[Byte]): Unit = updateHash(kernel.hash64(data))
  def update(s: String): Unit = update(ByteOps.utf8(s))
  def updateLong(v: Long): Unit = {
    scratch(0) = (v >>> 56).toByte; scratch(1) = (v >>> 48).toByte
    scratch(2) = (v >>> 40).toByte; scratch(3) = (v >>> 32).toByte
    scratch(4) = (v >>> 24).toByte; scratch(5) = (v >>> 16).toByte
    scratch(6) = (v >>> 8).toByte; scratch(7) = v.toByte
    update(scratch)
  }
  @transient private lazy val scratch = new Array[Byte](8)

  /** Register update from an already-computed 64-bit code.
    *
    * The code is passed through the standard Murmur3 fmix64 avalanche
    * first: the reference's Murmur2 variant (signed shifts, `seed ^ len`
    * init, `MurmurHash.java:145-171`) measurably biases its top bits on
    * short inputs (occupancy ~11% below uniform at p=12), which breaks
    * the 1.04/sqrt(m) bound HLL's analysis assumes of its hash. */
  def updateHash(code: Long): Unit = {
    val h = HllSketch.fmix64(code)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (registers(idx) < rank) registers(idx) = rank.toByte
  }

  def estimate(): Double = {
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      z += java.lang.Double.longBitsToDouble((1023L - registers(i)) << 52) // 2^-r
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m * m / z
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  def merge(other: HllSketch): HllSketch = {
    require(p == other.p && kernel.name == other.kernel.name,
      s"Incompatible HLL sketches: ($p,${kernel.name}) vs (${other.p},${other.kernel.name})")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val nameBytes = ByteOps.utf8(kernel.name)
    val buf = ByteBuffer.allocate(4 + 1 + 4 + nameBytes.length + 4 + m)
    buf.putInt(Magic)
    buf.put(Version)
    buf.putInt(nameBytes.length)
    buf.put(nameBytes)
    buf.putInt(p)
    buf.put(registers)
    buf.array()
  }

  def copy(): HllSketch = new HllSketch(kernel, p, registers.clone())
}

object HllSketch {
  final val Magic = 0x484c4c31 // "HLL1"
  final val Version: Byte = 1

  def apply(p: Int, kernel: HashKernel64 = HashKernels.murmur): HllSketch = {
    require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")
    new HllSketch(kernel, p, new Array[Byte](1 << p))
  }

  /** Murmur3's 64-bit finalizer (public domain, Appleby): full avalanche. */
  @inline def fmix64(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** sigma = 1.04/sqrt(m), the published standard error. */
  def standardError(p: Int): Double = 1.04 / math.sqrt((1 << p).toDouble)

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt() == Magic, "not an HllSketch buffer")
    require(buf.get() == Version, "unsupported HllSketch version")
    val nameBytes = new Array[Byte](buf.getInt())
    buf.get(nameBytes)
    val kernel = HashKernels(new String(nameBytes, "UTF-8"))
    val p = buf.getInt()
    val registers = new Array[Byte](1 << p)
    buf.get(registers)
    new HllSketch(kernel, p, registers)
  }
}
