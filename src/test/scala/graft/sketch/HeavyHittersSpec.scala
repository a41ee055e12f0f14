package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving guarantees: top-k recovery on Zipf data, the
  * [count-error, count] envelope, and merge preservation. */
class HeavyHittersSpec extends AnyFunSuite {

  private def zipfStream(n: Int, keys: Int): Seq[String] = {
    // deterministic zipf-ish: key i appears ~ n/(i+1) times, shuffled
    val items = (0 until keys).flatMap(i => Seq.fill(math.max(1, n / (i + 1)))(s"k$i"))
    new scala.util.Random(7).shuffle(items.toVector)
  }

  test("top-k on zipf data recovered exactly with bounded counts") {
    val stream = zipfStream(20000, 500)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hh = HeavyHittersSketch(64)
    stream.foreach(hh.update(_))
    assert(hh.n === stream.size)
    val top10 = hh.topK(10).map(_._1)
    val exactTop10 = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10).map(_._1)
    assert(top10.toSet === exactTop10.toSet, s"got $top10 expected $exactTop10")
    // envelope: lower <= true <= count for every tracked item
    hh.topK(64).foreach { case (k, count, lower) =>
      val t = exact.getOrElse(k, 0L)
      assert(t <= count, s"$k true=$t > upper=$count")
      assert(t >= lower, s"$k true=$t < lower=$lower")
    }
    // frequency guarantee: any item with freq > N/capacity is tracked
    val threshold = stream.size / 64
    val tracked = hh.topK(64).map(_._1).toSet
    exact.filter(_._2 > threshold).keys.foreach(k =>
      assert(tracked.contains(k), s"frequent item $k untracked"))
  }

  test("merge preserves the envelope and top items across splits") {
    val stream = zipfStream(30000, 300)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(2, 8)) {
      val sketches = stream.grouped(stream.size / parts + 1).map { chunk =>
        val s = HeavyHittersSketch(128)
        chunk.foreach(s.update(_))
        s
      }.toSeq
      val merged = sketches.reduceLeft((a, b) => a.merge(b))
      assert(merged.n === stream.size)
      merged.topK(128).foreach { case (k, count, _) =>
        assert(exact.getOrElse(k, 0L) <= count, s"parts=$parts $k over-upper")
      }
      val exactTop5 = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(5).map(_._1).toSet
      assert(merged.topK(8).map(_._1).toSet.intersect(exactTop5).size >= 4,
        s"parts=$parts lost top items")
    }
    intercept[IllegalArgumentException](HeavyHittersSketch(10).merge(HeavyHittersSketch(20)))
  }

  test("serialization round-trips") {
    val hh = HeavyHittersSketch(32)
    (0 until 5000).foreach(i => hh.update(s"v${i % 77}"))
    val back = HeavyHittersSketch.deserialize(hh.serialize())
    assert(back.n === hh.n)
    assert(back.topK(32) === hh.topK(32))
  }

  test("eviction and merge truncation are deterministic under count ties") {
    // all counters tie — the eviction victim and the merge's kept set
    // must come from the (count, key) total order, never hash-map
    // iteration order (retried tasks must serialize identical sketches)
    def build(order: Seq[String]): HeavyHittersSketch = {
      val hh = HeavyHittersSketch(4)
      order.foreach(hh.update(_))
      hh.update("zzz-newcomer") // forces one eviction among tied minimums
      hh
    }
    val keys = Seq("a", "b", "c", "d")
    val s1 = build(keys)
    val s2 = build(keys.reverse)
    assert(java.util.Arrays.equals(s1.serialize(), s2.serialize()),
      "insertion order must not leak into the sketch under ties")
    // the evicted victim is the lexicographically smallest tied key
    assert(!s1.topK(4).exists(_._1 == "a"))

    // merge truncation ties break the same way across construction order
    def half(ks: Seq[String]): HeavyHittersSketch = {
      val hh = HeavyHittersSketch(4)
      ks.foreach(hh.update(_))
      hh
    }
    val m1 = half(Seq("p", "q", "r", "s")).merge(half(Seq("t", "u", "v", "w")))
    val m2 = half(Seq("w", "v", "u", "t")).merge(half(Seq("s", "r", "q", "p")))
    assert(java.util.Arrays.equals(m1.serialize(), m2.serialize()))
  }
}
