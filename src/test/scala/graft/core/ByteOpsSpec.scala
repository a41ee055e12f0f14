package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the byte-arithmetic substrate, including the
  * differential check of the limb-based 128-bit multiply against the
  * BigInteger oracle — the analog of the reference's jruby cross-check
  * (`src/test/jruby/validate_mult128.rb`). Deterministic seeded streams
  * instead of a property-check DSL (offline-resolvable deps only). */
class ByteOpsSpec extends AnyFunSuite {
  private def rng = new java.util.Random(0)

  test("multiply128 limb arithmetic matches BigInteger oracle") {
    val r = rng
    (1 to 10000).foreach { _ =>
      val a = r.nextLong(); val b = r.nextLong()
      assert(ByteOps.multiply128(a, b) === ByteOps.multiply128Exact(a, b))
    }
    for {
      a <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 0xc6a4a7935bd1e995L)
      b <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 0x9e3779b97f4a7c13L)
    } assert(ByteOps.multiply128(a, b) === ByteOps.multiply128Exact(a, b))
  }

  test("gatherLongLE == gatherIntLE pair composition") {
    val r = rng
    (1 to 1000).foreach { _ =>
      val data = new Array[Byte](16)
      r.nextBytes(data)
      val lo = ByteOps.uintToLong(ByteOps.gatherIntLE(data, 0))
      val hi = ByteOps.gatherIntLE(data, 4).toLong << 32
      assert(ByteOps.gatherLongLE(data, 0) === (lo | hi))
    }
  }

  test("gatherPartialLongLE high/low layout for 4 <= n < 8") {
    // bytes 0..3 end up in the HIGH part, shifted by 8*(n-4) — the
    // reference's quirky layout (LongHashMethods.java:78-99).
    val data = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    assert(ByteOps.gatherPartialLongLE(data, 0, 4) === 0x04030201L)
    assert(ByteOps.gatherPartialLongLE(data, 0, 5) === ((0x04030201L << 8) | 0x05L))
    assert(ByteOps.gatherPartialLongLE(data, 0, 7) ===
      ((0x04030201L << 24) | 0x070605L))
    assert(ByteOps.gatherPartialLongLE(data, 0, 3) === 0x030201L)
  }

  test("rotates are signed-shift pseudo-rotations (not true rotations)") {
    // HARDCODED goldens printed by the COMPILED reference's
    // LongHashMethods (not a re-typed copy of the formula — an oracle
    // that shares the implementation's expression can never catch a
    // mistranscription, e.g. >> vs >>>)
    assert(ByteOps.rotateInt(-2, 1) === -1)
    assert(ByteOps.rotateLong(-2L, 1) === -1L)
    assert(ByteOps.rotateInt(0x12345678, 7) === -266049364)
    assert(ByteOps.rotateLong(0x123456789abcdefL, 13) === 8032179943414451550L)
    // a TRUE rotation of -2 by 1 would be Integer.rotateRight(-2,1) =
    // 0x7fffffff, not -1 — the signed-shift quirk is the contract
    assert(ByteOps.rotateInt(-2, 1) !== Integer.rotateRight(-2, 1))
  }

  test("condense folds at rotating position") {
    val bytes = Array.tabulate(20)(i => (i + 1).toByte)
    // goldens from the compiled reference (same rationale as above)
    assert(ByteOps.condenseBytesIntoLong(bytes) === 1731642887648254489L)
    assert(ByteOps.condenseBytesIntoInt(bytes) === 68358673)
  }
}
