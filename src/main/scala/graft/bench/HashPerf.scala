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
    val input = ByteOps.utf8(
      "the quick brown fox jumps over the lazy dog while two cats watch from the window sill")
    require(input.length == 85, s"len=${input.length}")
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
