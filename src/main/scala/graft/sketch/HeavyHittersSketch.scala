package graft.sketch

import java.nio.ByteBuffer

import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005):
  * at most `capacity` counters; an untracked arrival evicts the minimum
  * counter and inherits its count as error. Guarantee: for every tracked
  * item, trueCount in [count - error, count], and any item with true
  * frequency > N/capacity is tracked.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.
  * 2012): a key absent on one side contributes that side's minimum
  * counter as both count and error upper-bound; the union is then
  * truncated back to `capacity` counters. The [count - error, count]
  * guarantee survives merging.
  */
final class HeavyHittersSketch private (
    val capacity: Int,
    private var totalN: Long,
    private val counters: mutable.HashMap[String, HeavyHittersSketch.Counter])
    extends Serializable {

  import HeavyHittersSketch._

  def n: Long = totalN
  def trackedCount: Int = counters.size

  def update(item: String, weight: Long = 1L): Unit = {
    totalN += weight
    counters.get(item) match {
      case Some(c) => c.count += weight
      case None if counters.size < capacity =>
        counters(item) = new Counter(weight, 0L)
      case None =>
        // evict the minimum; the newcomer inherits its count as error
        val (minKey, minC) = counters.minBy(_._2.count)
        counters.remove(minKey)
        counters(item) = new Counter(minC.count + weight, minC.count)
    }
  }

  private def minCount: Long =
    if (counters.size < capacity) 0L else counters.valuesIterator.map(_.count).min

  def merge(other: HeavyHittersSketch): HeavyHittersSketch = {
    require(capacity == other.capacity,
      s"Incompatible heavy-hitters sketches: capacity=$capacity vs ${other.capacity}")
    val minA = this.minCount
    val minB = other.minCount
    val keys = counters.keySet ++ other.counters.keySet
    val merged = keys.iterator.map { k =>
      val a = counters.get(k)
      val b = other.counters.get(k)
      val count = a.map(_.count).getOrElse(minA) + b.map(_.count).getOrElse(minB)
      val err = a.map(_.error).getOrElse(minA) + b.map(_.error).getOrElse(minB)
      k -> new Counter(count, err)
    }.toSeq.sortBy(-_._2.count).take(capacity)
    counters.clear()
    merged.foreach { case (k, c) => counters(k) = c }
    totalN += other.totalN
    this
  }

  /** Tracked items by descending count: (item, count, guaranteed lower
    * bound = count - error). */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq.sortBy { case (key, c) => (-c.count, key) }
      .take(k)
      .map { case (key, c) => (key, c.count, c.count - c.error) }

  /** Upper-bound frequency estimate for an item (minCount if untracked). */
  def estimate(item: String): Long =
    counters.get(item).map(_.count).getOrElse(minCount)

  def serialize(): Array[Byte] = {
    val entries = counters.toSeq.sortBy { case (key, c) => (-c.count, key) }
    val keyBytes = entries.map { case (k, _) => graft.core.ByteOps.utf8(k) }
    val size = 4 + 1 + 4 + 8 + 4 + keyBytes.map(_.length + 4 + 16).sum
    val buf = ByteBuffer.allocate(size)
    buf.putInt(Magic)
    buf.put(Version)
    buf.putInt(capacity)
    buf.putLong(totalN)
    buf.putInt(entries.length)
    entries.zip(keyBytes).foreach { case ((_, c), kb) =>
      buf.putInt(kb.length)
      buf.put(kb)
      buf.putLong(c.count)
      buf.putLong(c.error)
    }
    buf.array()
  }
}

object HeavyHittersSketch {
  final val Magic = 0x48483131 // "HH11"
  final val Version: Byte = 1

  private[sketch] final class Counter(var count: Long, var error: Long)
    extends Serializable

  def apply(capacity: Int = 256): HeavyHittersSketch = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    new HeavyHittersSketch(capacity, 0L, mutable.HashMap.empty)
  }

  def deserialize(bytes: Array[Byte]): HeavyHittersSketch = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.getInt() == Magic, "not a HeavyHittersSketch buffer")
    require(buf.get() == Version, "unsupported HeavyHittersSketch version")
    val capacity = buf.getInt()
    val totalN = buf.getLong()
    val n = buf.getInt()
    val m = mutable.HashMap.empty[String, Counter]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](buf.getInt())
      buf.get(kb)
      m(new String(kb, "UTF-8")) = new Counter(buf.getLong(), buf.getLong())
      i += 1
    }
    new HeavyHittersSketch(capacity, totalN, m)
  }
}
