package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** Error-bound and merge-contract tests for the graft sketch extensions
  * (SURVEY.md §2.6): HLL within 3 sigma of 1.04/sqrt(m); CMS within the
  * published eps/delta envelope; KLL rank error within eps; and for each,
  * partition-order-independent merging (byte-identical for HLL/CMS,
  * bound-preserving for KLL).
  */
class SketchAccuracySpec extends AnyFunSuite {

  test("HLL estimate within 3*1.04/sqrt(m) on deterministic corpora") {
    for (p <- Seq(12, 14); trueCard <- Seq(1000, 50000, 200000)) {
      val h = HllSketch(p)
      (0 until trueCard).foreach(i => h.update(s"conv-$i"))
      val err = math.abs(h.estimate() - trueCard) / trueCard
      assert(err <= 3 * HllSketch.standardError(p),
        s"p=$p card=$trueCard err=$err bound=${3 * HllSketch.standardError(p)}")
    }
  }

  test("HLL small-range (linear counting) regime is near-exact") {
    val h = HllSketch(12)
    (0 until 50).foreach(i => h.update(s"x$i"))
    assert(math.abs(h.estimate() - 50) <= 2)
  }

  test("HLL duplicate-insensitive: repeats do not change the estimate") {
    val a = HllSketch(12)
    val b = HllSketch(12)
    (0 until 10000).foreach(i => a.update(s"v$i"))
    (0 until 10000).foreach(i => { b.update(s"v$i"); b.update(s"v$i") })
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("HLL merge: byte-identical regardless of split/order; config mismatch rejected") {
    val items = (0 until 30000).map(i => s"conv-$i")
    def of(xs: Seq[String]): HllSketch = {
      val s = HllSketch(12)
      xs.foreach(s.update)
      s
    }
    val whole = of(items)
    val r = new scala.util.Random(3)
    val parts = items.groupBy(_ => r.nextInt(8)).values.toIndexedSeq.map(of)
    val merged = parts.reduceLeft((a, b) => a.merge(b))
    val mergedRev = parts.reverse.reduceLeft((a, b) => a.merge(b))
    assert(java.util.Arrays.equals(merged.serialize(), whole.serialize()))
    assert(java.util.Arrays.equals(mergedRev.serialize(), whole.serialize()))
    intercept[IllegalArgumentException](HllSketch(12).merge(HllSketch(13)))
  }

  test("HLL sparse mode: tiny buffers for small groups, identical estimator") {
    // a handful of values stays sparse and serializes to O(n), not 2^p
    val small = HllSketch(14)
    (0 until 20).foreach(i => small.update(s"s$i"))
    assert(small.isSparse)
    val bytes = small.serialize()
    assert(bytes.length < 200, s"sparse bytes = ${bytes.length}")
    assert(math.abs(HllSketch.deserialize(bytes).estimate() - 20) <= 1)
    // upgrade happens at the occupancy threshold and estimator stays in-bound
    val big = HllSketch(12)
    (0 until 5000).foreach(i => big.update(s"b$i"))
    assert(!big.isSparse)
    assert(math.abs(big.estimate() - 5000) / 5000.0 <= 3 * HllSketch.standardError(12))
  }

  test("HLL sparse canonical bytes: insertion order, splits and merges irrelevant") {
    val items = (0 until 100).map(i => s"item-$i") // < threshold at p=14: stays sparse
    def of(xs: Seq[String]): HllSketch = {
      val s = HllSketch(14)
      xs.foreach(s.update)
      s
    }
    val a = of(items)
    val b = of(new scala.util.Random(7).shuffle(items))
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
    // sparse+sparse merge == single-pass build
    val halves = items.grouped(50).toSeq.map(of)
    assert(java.util.Arrays.equals(halves.reduceLeft(_ merge _).serialize(), a.serialize()))
    // mixed sparse/dense merges converge to the same dense bytes
    val many = (0 until 30000).map(i => s"conv-$i")
    val whole = of(many ++ items)
    val m1 = of(many).merge(of(items)) // dense <- sparse
    val m2 = of(items).merge(of(many)) // sparse <- dense
    assert(java.util.Arrays.equals(m1.serialize(), whole.serialize()))
    assert(java.util.Arrays.equals(m2.serialize(), whole.serialize()))
    // round-1 (version 1) dense wire format still deserializes: same
    // layout as v2-dense minus the mode byte, version tag 1
    val v2 = whole.serialize()
    val modePos = 4 + 1 + 4 + "murmur2".length + 4
    val v1 = new Array[Byte](v2.length - 1)
    System.arraycopy(v2, 0, v1, 0, modePos)
    System.arraycopy(v2, modePos + 1, v1, modePos, v2.length - modePos - 1)
    v1(4) = HllSketch.VersionDenseOnly
    val legacy = HllSketch.deserialize(v1)
    assert(legacy.estimate() === whole.estimate())
    assert(java.util.Arrays.equals(legacy.serialize(), v2))

    // a LOW-occupancy v1 dense buffer re-canonicalizes to sparse bytes, so
    // "equal register state => equal bytes" holds across wire versions
    val sparseBytes = a.serialize()
    val bb = java.nio.ByteBuffer.wrap(sparseBytes)
    bb.position(21) // header + mode byte
    val cnt = bb.getInt()
    val regs = new Array[Byte](1 << 14)
    (0 until cnt).foreach { _ =>
      val pk = bb.getInt()
      regs(pk >>> 6) = (pk & 0x3f).toByte
    }
    val v1lo = java.nio.ByteBuffer.allocate(20 + regs.length)
    v1lo.putInt(HllSketch.Magic)
    v1lo.put(HllSketch.VersionDenseOnly)
    v1lo.putInt(7)
    v1lo.put("murmur2".getBytes("UTF-8"))
    v1lo.putInt(14)
    v1lo.put(regs)
    assert(java.util.Arrays.equals(
      HllSketch.deserialize(v1lo.array()).serialize(), sparseBytes))
  }

  test("CMS: estimate >= true, and <= true + eps*N for probed keys") {
    val d = 5
    val w = 1 << 14
    val cms = CmsSketch(d, w)
    // zipf-ish frequencies: key i appears ~ 50000/(i+1) times
    val freqs = (0 until 500).map(i => s"key-$i" -> math.max(1, 50000 / (i + 1)))
    freqs.foreach { case (k, c) => (0 until c).foreach(_ => cms.update(k)) }
    val n = cms.n
    assert(n === freqs.map(_._2.toLong).sum)
    val eps = cms.epsilon
    var failures = 0
    freqs.foreach { case (k, c) =>
      val est = cms.estimate(k)
      assert(est >= c, s"CMS underestimated $k: $est < $c")
      if (est > c + eps * n) failures += 1
    }
    // delta = e^-5 ~ 0.0067 failure budget across 500 probes => expect ~3
    assert(failures <= math.max(5, (freqs.size * cms.delta * 3).toInt),
      s"CMS overflow failures=$failures")
  }

  test("CMS merge: byte-identical regardless of split/order") {
    val items = (0 until 20000).map(i => s"key-${i % 997}")
    def of(xs: Seq[String]): CmsSketch = {
      val s = CmsSketch(5, 1 << 12)
      xs.foreach(s.update)
      s
    }
    val whole = of(items)
    val r = new scala.util.Random(11)
    val parts = items.groupBy(_ => r.nextInt(5)).values.toIndexedSeq.map(of)
    val merged = parts.reduceLeft((a, b) => a.merge(b))
    assert(java.util.Arrays.equals(merged.serialize(), whole.serialize()))
    assert(merged.n === whole.n)
  }

  test("CMS sparse mode: small buffers for small groups, canonical bytes, exact counts") {
    // few keys stay sparse: serialized size O(keys*d), not d*w*8
    val small = CmsSketch(5, 1 << 14)
    (0 until 40).foreach(i => small.update(s"k${i % 10}"))
    assert(small.isSparse)
    val bytes = small.serialize()
    assert(bytes.length < 1200, s"sparse bytes = ${bytes.length}")
    val back = CmsSketch.deserialize(bytes)
    (0 until 10).foreach(i => assert(back.estimate(s"k$i") === 4L))
    assert(back.n === 40L)
    // canonical: insertion order and split/merge do not change bytes
    def of(xs: Seq[String]): CmsSketch = {
      val s = CmsSketch(5, 1 << 14)
      xs.foreach(s.update)
      s
    }
    val items = (0 until 200).map(i => s"key-${i % 50}")
    val a = of(items)
    val b = of(new scala.util.Random(11).shuffle(items))
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
    val halves = items.grouped(100).toSeq.map(of)
    assert(java.util.Arrays.equals(halves.reduceLeft(_ merge _).serialize(), a.serialize()))
    // mixed sparse/dense merges match an all-at-once dense build
    val many = (0 until 30000).map(i => s"m-$i")
    val whole = of(many ++ items)
    assert(!whole.isSparse)
    val m1 = of(many).merge(of(items)) // dense <- sparse
    val m2 = of(items).merge(of(many)) // sparse <- dense
    assert(java.util.Arrays.equals(m1.serialize(), whole.serialize()))
    assert(java.util.Arrays.equals(m2.serialize(), whole.serialize()))
    // round-1 (version 1) dense wire format still deserializes: v2-dense
    // layout minus the mode byte, version tag 1
    val v2 = whole.serialize()
    val modePos = 4 + 1 + 4 + "murmur2".length + 4 + 4 + 8
    val v1 = new Array[Byte](v2.length - 1)
    System.arraycopy(v2, 0, v1, 0, modePos)
    System.arraycopy(v2, modePos + 1, v1, modePos, v2.length - modePos - 1)
    v1(4) = CmsSketch.VersionDenseOnly
    val legacy = CmsSketch.deserialize(v1)
    assert(legacy.n === whole.n)
    assert(java.util.Arrays.equals(legacy.serialize(), v2))

    // LOW-occupancy v1 dense buffer re-canonicalizes to sparse bytes
    val sparseBytes = a.serialize()
    val bb = java.nio.ByteBuffer.wrap(sparseBytes)
    // header layout: magic(4) ver(1) nameLen(4) name(7) d(4) w(4) n(8) mode(1)
    bb.position(33)
    val cnt = bb.getInt()
    val cells = new Array[Long](5 * (1 << 14))
    (0 until cnt).foreach { _ =>
      val idx = bb.getInt()
      cells(idx) = bb.getLong()
    }
    val v1lo = java.nio.ByteBuffer.allocate(32 + cells.length * 8)
    v1lo.putInt(CmsSketch.Magic)
    v1lo.put(CmsSketch.VersionDenseOnly)
    v1lo.putInt(7)
    v1lo.put("murmur2".getBytes("UTF-8"))
    v1lo.putInt(5)
    v1lo.putInt(1 << 14)
    v1lo.putLong(a.n)
    cells.foreach(v1lo.putLong)
    assert(java.util.Arrays.equals(
      CmsSketch.deserialize(v1lo.array()).serialize(), sparseBytes))
  }

  test("KLL: rank error within eps at standard quantiles, exact ground truth") {
    val k = 200
    val n = 100000
    val kll = KllSketch(k)
    // deterministic shuffled stream of 0..n-1
    val r = new scala.util.Random(42)
    val values = r.shuffle((0 until n).toVector)
    values.foreach(v => kll.update(v.toDouble))
    assert(kll.n === n)
    val eps = KllSketch.epsilon(k) * 3 // 3x headroom on the w.h.p. constant
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = kll.quantile(q)
      val trueRank = q * n
      val estRank = est // values are 0..n-1 so value == its rank
      val rankErr = math.abs(estRank - trueRank) / n
      assert(rankErr <= eps, s"q=$q est=$est rankErr=$rankErr eps=$eps")
    }
  }

  test("KLL: weight conservation — rank of +inf equals n, serialization round-trips") {
    val kll = KllSketch(128)
    (0 until 54321).foreach(i => kll.update((i * 31 % 1000).toDouble))
    assert(kll.rank(Double.MaxValue) === 54321L)
    val back = KllSketch.deserialize(kll.serialize())
    assert(back.n === kll.n)
    assert(back.quantile(0.5) === kll.quantile(0.5))
    assert(back.rank(Double.MaxValue) === 54321L)
  }

  test("KLL merge: quantiles stay within bound regardless of partitioning") {
    val n = 60000
    val r = new scala.util.Random(9)
    val values = r.shuffle((0 until n).toVector)
    for (parts <- Seq(1, 8, 32)) {
      val sketches = values.grouped(math.max(1, n / parts)).map { chunk =>
        val s = KllSketch(200)
        chunk.foreach(v => s.update(v.toDouble))
        s
      }.toSeq
      val merged = sketches.reduceLeft((a, b) => a.merge(b))
      assert(merged.n === n)
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val rankErr = math.abs(merged.quantile(q) - q * n) / n
        assert(rankErr <= 3 * KllSketch.epsilon(200), s"parts=$parts q=$q err=$rankErr")
      }
    }
    intercept[IllegalArgumentException](KllSketch(100).merge(KllSketch(200)))
  }

  test("KLL exact regime (k >= n): quantile is the order statistic at the smallest rank >= q*n") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 5, 100, 1000)) {
      val vals = Array.fill(n)(rnd.nextInt(50).toDouble)
      // single sketch
      val sk = KllSketch(math.max(8, n + 1))
      vals.foreach(sk.update)
      // and the aggregation shape: partial sketches merged
      val parts = vals.grouped(math.max(1, n / 3)).map { chunk =>
        val p = KllSketch(math.max(8, n + 1))
        chunk.foreach(p.update)
        p
      }.toSeq
      val merged = parts.tail.foldLeft(parts.head)(_ merge _)
      val sorted = vals.sorted
      for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 1.0)) {
        val rank = math.max(1, math.ceil(q * n).toInt) // smallest r >= q*n
        assert(sk.quantile(q) === sorted(rank - 1), s"n=$n q=$q single")
        assert(merged.quantile(q) === sorted(rank - 1), s"n=$n q=$q merged")
      }
    }
  }

  test("CMS update rejects non-positive counts (cash-register model)") {
    val cms = CmsSketch(5, 1024)
    val x = graft.core.ByteOps.utf8("x")
    intercept[IllegalArgumentException](cms.update(x, 0L))
    intercept[IllegalArgumentException](cms.update(x, -3L))
    cms.update(x, 2L) // positive still fine
    assert(cms.estimate(x) === 2L)
  }

  test("KLL merge RNG never collapses to the xorshift fixed point") {
    // two fresh partials share the deterministic seed; the old
    // `a ^= b | 1` mix zeroed the state here and every later compaction
    // coin-flip came up 0 — the bound's random offset was gone
    val a = KllSketch(200)
    val b = KllSketch(200)
    (1 to 50).foreach(i => { a.update(i.toDouble); b.update(i + 100.0) })
    a.merge(b)
    assert(a.rngStateForTest !== 0L, "merge RNG state must stay non-zero")
    // chains of same-seed merges (the reduce-tree shape) stay non-zero too
    val c = KllSketch(200)
    (1 to 6).foreach { _ =>
      val fresh = KllSketch(200)
      fresh.update(1.0)
      c.merge(fresh)
      assert(c.rngStateForTest !== 0L)
    }
  }

  test("Bloom merge rejects bitsPerItem mismatch even when k collides") {
    // k = ceil(0.7*bpi) gives k=7 for BOTH bpi=9 and bpi=10 — but the
    // bit-set geometry differs, and the reference's (k, maxSize, hash)
    // check would OR mismatched layouts (accidental corruption, not
    // contract; we are deliberately stricter)
    val a = BloomSketch(1024, 9)
    val b = BloomSketch(1024, 10)
    assert(a.k === b.k)
    a.put(graft.core.ByteOps.utf8("x"))
    b.put(graft.core.ByteOps.utf8("y"))
    intercept[IllegalArgumentException](a.merge(b))
  }
}
