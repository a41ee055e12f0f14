package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.spark.functions.{bloom_might_contain, bloom_sketch}

/** Bloom-accelerated exact semi/anti joins — the reference's `ckblm`
  * membership filter (`cmd/ckblm.java:63-66`) promoted to a JOIN
  * pushdown, the classic runtime-filter pattern made explicit.
  *
  * Shape at scale: the probe side is filtered by a compact Bloom sketch
  * of the build side's keys BEFORE any exchange, so the join shuffles
  * |matches| + |false positives| rows instead of |large|. Bloom
  * guarantees no false negatives, which yields exactness both ways:
  *
  *  - SEMI: the prefilter may pass false positives, so an exact
  *    left-semi join runs after it — on the (small) surviving subset.
  *  - ANTI: rows the filter rejects are PROVABLY absent from the build
  *    side and are emitted directly; only the "maybe" subset pays an
  *    exact anti join. With FPR ~0.62^bitsPerItem, the exact-join input
  *    shrinks to |matches| + ~FPR·|large|.
  *
  * Sizing: the sketch is built at `maxSize = distinct build keys` via one
  * count over the (small) build side — the mkblm sizing rule.
  *
  * Kernel choice: integral keys canonicalize to 8-byte binary and are
  * safe with the default murmur2. For SHORT DECIMAL-STRING keys pass
  * `kernel = "jenkins"` — the reference's murmur2 seed-by-index k-vector
  * provably collapses Bloom FPR on such keys (to ~50% at bpi=16; pinned
  * in BloomSketchSpec against the compiled reference), which would keep
  * the prefilter correct but useless.
  */
object BloomJoin {

  private def keySketch(small: DataFrame, smallKey: String, bitsPerItem: Int,
      kernel: String): Array[Byte] = {
    val keys = small.select(F.col(smallKey)).na.drop()
    // Size by the NON-distinct row count: one metadata-cheap count
    // instead of a distinct exchange + count + re-scan (three passes over
    // the build side, measured on incremental_dedup). Row count >=
    // distinct count, so the sketch is at or above the mkblm
    // bits-per-distinct-item target — FPR only ever IMPROVES — and
    // re-putting a duplicate key sets the identical bits, so the sketch
    // CONTENT doesn't need the distinct either. Join results are exact
    // regardless of FPR (semi/anti re-verify), so sizing affects cost,
    // never output.
    val n = math.max(128L, keys.count()) // floor keeps tiny builds valid (128 bitsets)
    keys.agg(bloom_sketch(F.col(smallKey), n, bitsPerItem, kernel))
      .head().getAs[Array[Byte]](0)
  }

  /** Exact `large SEMI JOIN small ON large(largeKey) = small(smallKey)`,
    * Bloom-prefiltered. */
  def semi(large: DataFrame, largeKey: String, small: DataFrame, smallKey: String,
      bitsPerItem: Int = 16, kernel: String = "murmur2"): DataFrame = {
    val sketch = keySketch(small, smallKey, bitsPerItem, kernel)
    large.filter(bloom_might_contain(F.lit(sketch), F.col(largeKey)))
      .join(small.select(F.col(smallKey).as(largeKey)).distinct(),
        Seq(largeKey), "left_semi")
  }

  /** Exact `large ANTI JOIN small`: Bloom-rejected rows ship straight to
    * the output (no false negatives => provably absent); only the
    * "might contain" subset pays the exact anti join. */
  def anti(large: DataFrame, largeKey: String, small: DataFrame, smallKey: String,
      bitsPerItem: Int = 16, kernel: String = "murmur2"): DataFrame = {
    val sketch = keySketch(small, smallKey, bitsPerItem, kernel)
    val pred = bloom_might_contain(F.lit(sketch), F.col(largeKey))
    val definitelyAbsent = large.filter(F.col(largeKey).isNotNull && !pred)
    val maybe = large.filter(F.col(largeKey).isNull || pred)
      .join(small.select(F.col(smallKey).as(largeKey)).distinct(),
        Seq(largeKey), "left_anti")
    // unionByName, NOT positional unionAll: a using-column join moves the
    // key column first in its output, so the two branches' column orders
    // differ whenever largeKey is not large's first column
    definitelyAbsent.unionByName(maybe)
  }
}
