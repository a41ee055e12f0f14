package graft.bench

import graft.core.ByteOps
import graft.core.hash.HashKernels

/** Single-thread hash-kernel throughput, same harness shape as the
  * reference's `TestLongHashPerf.java:11-40` (repeated rounds over an
  * 83-byte UTF-8 input) so numbers compare directly against the measured
  * reference baselines in BASELINE.md (murmur 29.7 M/s, jenkins 16.4,
  * cwow 19.8, fnv1a 12.8 on this machine). */
object HashPerf {
  def main(args: Array[String]): Unit = {
    // 83 bytes — the REFERENCE harness's input length
    // (`TestLongHashPerf.java`'s TEST_DATA is 83 UTF-8 bytes), so the
    // 64-bit kernels take the same block/tail path (83 % 8 = 3 tail
    // bytes) and M-hashes/s compares like for like. The earlier 85-byte
    // input exercised a different tail; same-day A/B ratios were
    // unaffected (both sides hashed the same bytes) but the absolute
    // "83-byte" label was wrong.
    val input = ByteOps.utf8(
      "the quick brown fox jumps over the lazy dog while two old cats watch from the barns")
    require(input.length == 83, s"len=${input.length}")
    val n = 15000000
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val kernels = HashKernels.all.filterNot(_.name == "sha1prng")
    // scalastyle:off println
    for (round <- 1 to rounds) {
      kernels.foreach { k =>
        var acc = 0L
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) { acc ^= k.hash64(input); i += 1 }
        val sec = (System.nanoTime() - t0) / 1e9
        if (round == rounds) {
          println(f"${k.name}%-8s ${n / sec / 1e6}%6.1f M hashes/s  (acc=${acc}%x)")
        }
      }
    }
    // scalastyle:on println
  }
}
