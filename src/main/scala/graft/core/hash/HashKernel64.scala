package graft.core.hash

import graft.core.ByteOps

/** A 64/32-bit hash family with a *seeded multi-hash scheme*: `hash64K`
  * produces k correlated-but-distinct codes per input, and sketch bit
  * positions depend on the per-algorithm scheme (seed-by-index for
  * Murmur/Jenkins/CWow, chained for FNV/Hsieh, PRNG-stream for Sha1Prng).
  *
  * Mirrors the reference SPI (`LongHash.java:24-48` in
  * sunnygleason/g414-hash) with the contract its tests pin
  * (`HashImplTestBase.java:40-46`): the String overloads hash UTF-8 bytes,
  * and `hash64K(x, k)(0) == hash64(x)`.
  */
trait HashKernel64 extends Serializable {

  /** Stable identifier used in sketch-state compatibility checks. */
  def name: String

  def hash64(data: Array[Byte]): Long
  def hash32(data: Array[Byte]): Int

  /** k-vector of 64-bit codes; scheme is algorithm-specific. */
  def hash64K(data: Array[Byte], k: Int): Array[Long]

  /** k-vector of 32-bit codes; scheme is algorithm-specific. */
  def hash32K(data: Array[Byte], k: Int): Array[Int]

  /** Fill `out(0 until k)` with the k-vector without allocating — the
    * per-row hot path for sketch updates (buffers pass a reused scratch
    * array). Default delegates to hash64K; kernels override. */
  def hash64Into(data: Array[Byte], k: Int, out: Array[Long]): Unit = {
    val v = hash64K(data, k)
    System.arraycopy(v, 0, out, 0, k)
  }

  /** 32-bit variant of hash64Into. */
  def hash32Into(data: Array[Byte], k: Int, out: Array[Int]): Unit = {
    val v = hash32K(data, k)
    System.arraycopy(v, 0, out, 0, k)
  }

  final def hash64(s: String): Long = hash64(ByteOps.utf8(s))
  final def hash32(s: String): Int = hash32(ByteOps.utf8(s))
  final def hash64K(s: String, k: Int): Array[Long] = hash64K(ByteOps.utf8(s), k)
  final def hash32K(s: String, k: Int): Array[Int] = hash32K(ByteOps.utf8(s), k)

  protected final def requireK(k: Int): Unit =
    require(k >= 1, s"k must be >= 1, got $k")
}

/** Registry of all hash kernels by stable name, the analog of the
  * reference's reflective hash instantiation (`BloomFilter.java:96-104`)
  * without the reflection. */
object HashKernels {
  val murmur: Murmur2Kernel.type = Murmur2Kernel
  val jenkins: JenkinsKernel.type = JenkinsKernel
  val fnv1: Fnv1Kernel.type = Fnv1Kernel
  val fnv1a: Fnv1aKernel.type = Fnv1aKernel
  val hsieh: HsiehKernel.type = HsiehKernel
  val cwow: CWowKernel.type = CWowKernel
  val sha1prng: Sha1PrngKernel.type = Sha1PrngKernel

  val all: Seq[HashKernel64] =
    Seq(murmur, jenkins, fnv1, fnv1a, hsieh, cwow, sha1prng)

  private val byName: Map[String, HashKernel64] =
    all.map(h => h.name -> h).toMap

  def apply(name: String): HashKernel64 =
    byName.getOrElse(name, throw new IllegalArgumentException(s"unknown hash kernel: $name"))
}
