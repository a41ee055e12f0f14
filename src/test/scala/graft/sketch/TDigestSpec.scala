package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** t-digest accuracy and merge tests: quantile error vs exact on uniform
  * and heavy-tailed data, tail accuracy (the digest's selling point),
  * bounded centroid count, and partition-order robustness. */
class TDigestSpec extends AnyFunSuite {

  private def rankErr(vals: Array[Double], est: Double, q: Double): Double = {
    val r = vals.count(_ <= est).toDouble
    math.abs(r - q * vals.length) / vals.length
  }

  test("uniform data: rank error small at all quantiles, tiny at tails") {
    val n = 200000
    val r = new scala.util.Random(1)
    val vals = Array.fill(n)(r.nextDouble() * 1000)
    val td = TDigestSketch(100)
    vals.foreach(td.update(_))
    val sorted = vals.sorted
    for (q <- Seq(0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999)) {
      val err = rankErr(sorted, td.quantile(q), q)
      val bound = if (q <= 0.01 || q >= 0.99) 0.001 else 0.01
      assert(err <= bound, s"q=$q est=${td.quantile(q)} rankErr=$err")
    }
    assert(td.quantile(0.0) === sorted.head)
    assert(td.quantile(1.0) === sorted.last)
    assert(td.centroidCount <= 2 * 100, s"centroids=${td.centroidCount}")
  }

  test("heavy-tailed (lognormal) data: tail quantiles stay accurate") {
    val n = 100000
    val r = new scala.util.Random(5)
    val vals = Array.fill(n)(math.exp(r.nextGaussian() * 2.0))
    val td = TDigestSketch(100)
    vals.foreach(td.update(_))
    val sorted = vals.sorted
    for (q <- Seq(0.5, 0.9, 0.99, 0.999)) {
      val err = rankErr(sorted, td.quantile(q), q)
      assert(err <= 0.005, s"q=$q rankErr=$err")
    }
  }

  test("merge: split across simulated partitions stays within bound") {
    val n = 120000
    val r = new scala.util.Random(9)
    val vals = Array.fill(n)(r.nextDouble() * 100)
    val sorted = vals.sorted
    for (parts <- Seq(1, 8, 32)) {
      val sketches = vals.grouped(math.max(1, n / parts)).map { chunk =>
        val s = TDigestSketch(100)
        chunk.foreach(s.update(_))
        s
      }.toSeq
      val merged = sketches.reduceLeft((a, b) => a.merge(b))
      assert(math.abs(merged.n - n) < 1e-6)
      for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
        val err = rankErr(sorted, merged.quantile(q), q)
        assert(err <= 0.01, s"parts=$parts q=$q err=$err")
      }
    }
    intercept[IllegalArgumentException](TDigestSketch(50).merge(TDigestSketch(100)))
  }

  test("serialization round-trips; weight conserved exactly") {
    val td = TDigestSketch(100)
    (0 until 54321).foreach(i => td.update((i % 1000).toDouble))
    val back = TDigestSketch.deserialize(td.serialize())
    assert(back.n === td.n)
    assert(back.quantile(0.5) === td.quantile(0.5))
    assert(math.abs(td.n - 54321.0) < 1e-9)
  }
}
