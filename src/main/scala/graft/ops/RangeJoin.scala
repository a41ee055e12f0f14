package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Interval (range) join — attach to each event every interval
  * [start, end) containing its timestamp. The naive formulation is a
  * NON-EQUI join, which Spark can only plan as a broadcast nested loop
  * or cartesian — an all-pairs scan that collapses at corpus scale.
  *
  * Spark-first shape: quantize time into fixed buckets. Every event
  * carries one bucket; every interval is replicated onto each bucket it
  * overlaps (`sequence` + `explode` — an interval spanning k buckets
  * costs k rows, so `bucketWidth` trades interval replication against
  * bucket selectivity; set it near the typical interval length). The
  * join is then a plain EQUI-join on the bucket — hash-partitionable,
  * AQE-optimizable, broadcastable when the interval side is small — and
  * the exact containment predicate filters the bucket-mates. Equal to
  * the non-equi join by construction: any (event, interval) match shares
  * the event's bucket, because the interval covers it.
  */
object RangeJoin {

  /** `events` x `intervals` on numeric (e.g. epoch-seconds) columns:
    * every pair with `start <= ts < end`. Column sets must be disjoint
    * enough that `tsCol`, `startCol`, `endCol` resolve unambiguously.
    *
    * Buckets come from true FLOOR division in double (`floor(v / w)`),
    * so fractional and negative values bucket correctly — a long cast
    * would truncate toward zero and silently lose matches near bucket
    * boundaries for non-integer inputs. The interval's bucket range is
    * end-INCLUSIVE (`floor(end / w)`), which over-replicates a boundary-
    * aligned interval by one empty bucket but guarantees completeness:
    * any ts in [start, end) satisfies floor(start/w) <= floor(ts/w) <=
    * floor(end/w), and the exact predicate keeps soundness. Caveat: the
    * double division is exact for |values| < 2^53 — every epoch-seconds
    * or epoch-millis timestamp for the next ~285k years. */
  def intervalJoin(events: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be > 0")
    val clash = events.columns.intersect(intervals.columns)
    require(clash.isEmpty,
      s"event and interval columns must not overlap: ${clash.mkString(",")}")
    def bucketOf(c: org.apache.spark.sql.Column) =
      F.floor(c.cast("double") / F.lit(bucketWidth.toDouble)).cast("long")
    val e = events.withColumn("__b", bucketOf(F.col(tsCol)))
    // an empty interval (end <= start) overlaps nothing: guard the
    // sequence bounds so it produces no buckets instead of a negative range
    val i = intervals
      .filter(F.col(endCol) > F.col(startCol))
      .withColumn("__b", F.explode(F.sequence(
        bucketOf(F.col(startCol)), bucketOf(F.col(endCol)))))
    e.join(i, "__b")
      .filter(F.col(tsCol) >= F.col(startCol) && F.col(tsCol) < F.col(endCol))
      .drop("__b")
  }
}
