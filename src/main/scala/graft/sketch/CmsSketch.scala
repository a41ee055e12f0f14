package graft.sketch

import java.nio.ByteBuffer

import graft.core.ByteOps
import graft.core.hash.{HashKernel64, HashKernels}

/** Count-min sketch (Cormode & Muthukrishnan 2005): d rows of w counters;
  * row i indexes by the i-th code of the kernel's multi-hash vector —
  * the reference's seeded multi-hash scheme (`LongHash.getLongHashCodes`,
  * seed-by-index for Murmur) reused as the d independent hash functions.
  *
  * Published bound: estimate >= true count, and estimate <= true count +
  * eps*N with probability >= 1 - delta, where eps = e/w and delta = e^-d.
  * Merge = element-wise counter add — associative and commutative, so
  * partial aggregates combine identically regardless of partition order.
  */
final class CmsSketch private (
    val kernel: HashKernel64,
    val depth: Int,
    val width: Int,
    private var totalN: Long,
    private val counters: Array[Long]) extends Serializable {

  import CmsSketch._

  def n: Long = totalN

  @inline private def slot(row: Int, code: Long): Int = {
    val idx = (code % width).toInt
    row * width + (if (idx < 0) idx + width else idx)
  }

  // reused scratch: single-threaded buffer, removes per-row allocation
  @transient private lazy val scratch = new Array[Long](depth)

  def update(data: Array[Byte], count: Long = 1L): Unit = {
    val codes = scratch
    kernel.hash64Into(data, depth, codes)
    var i = 0
    while (i < depth) {
      counters(slot(i, codes(i))) += count
      i += 1
    }
    totalN += count
  }

  def update(s: String): Unit = update(ByteOps.utf8(s), 1L)

  /** THREAD-SAFE (allocates locally): probe-side sketches are shared. */
  def estimate(data: Array[Byte]): Long = {
    val codes = kernel.hash64K(data, depth)
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(slot(i, codes(i)))
      if (c < min) min = c
      i += 1
    }
    min
  }

  def estimate(s: String): Long = estimate(ByteOps.utf8(s))

  def merge(other: CmsSketch): CmsSketch = {
    require(depth == other.depth && width == other.width &&
      kernel.name == other.kernel.name,
      s"Incompatible CMS sketches: ($depth,$width,${kernel.name})" +
        s" vs (${other.depth},${other.width},${other.kernel.name})")
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
    totalN += other.totalN
    this
  }

  def serialize(): Array[Byte] = {
    val nameBytes = ByteOps.utf8(kernel.name)
    val buf = ByteBuffer.allocate(4 + 1 + 4 + nameBytes.length + 4 + 4 + 8 + counters.length * 8)
    buf.putInt(Magic)
    buf.put(Version)
    buf.putInt(nameBytes.length)
    buf.put(nameBytes)
    buf.putInt(depth)
    buf.putInt(width)
    buf.putLong(totalN)
    var i = 0
    while (i < counters.length) { buf.putLong(counters(i)); i += 1 }
    buf.array()
  }

  def copy(): CmsSketch = new CmsSketch(kernel, depth, width, totalN, counters.clone())

  /** eps = e/w: additive error bound per the published analysis. */
  def epsilon: Double = math.E / width

  /** delta = e^-d: failure probability per the published analysis. */
  def delta: Double = math.exp(-depth.toDouble)
}

object CmsSketch {
  final val Magic = 0x434d5331 // "CMS1"
  final val Version: Byte = 1

  def apply(depth: Int, width: Int, kernel: HashKernel64 = HashKernels.murmur): CmsSketch = {
    require(depth >= 1 && width >= 1, s"invalid CMS dims ($depth,$width)")
    new CmsSketch(kernel, depth, width, 0L, new Array[Long](depth * width))
  }

  def deserialize(bytes: Array[Byte]): CmsSketch = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt() == Magic, "not a CmsSketch buffer")
    require(buf.get() == Version, "unsupported CmsSketch version")
    val nameBytes = new Array[Byte](buf.getInt())
    buf.get(nameBytes)
    val kernel = HashKernels(new String(nameBytes, "UTF-8"))
    val depth = buf.getInt()
    val width = buf.getInt()
    val totalN = buf.getLong()
    val counters = new Array[Long](depth * width)
    var i = 0
    while (i < counters.length) { counters(i) = buf.getLong(); i += 1 }
    new CmsSketch(kernel, depth, width, totalN, counters)
  }
}
