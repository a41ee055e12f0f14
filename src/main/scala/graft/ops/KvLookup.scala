package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}

import graft.spark.functions.{graft_hash32, graft_hash64}

/** Associative-mode lookup — the reference's hash-keyed bag
  * (`Header2.java:79`: `isAssociative = keySize == ZERO`;
  * `HashFile2Builder.java:80-83`; retrieval at
  * `FileOperations2.java:260-263`): values are stored WITHOUT keys and
  * `getMulti` returns every value whose STORED HASH equals the probe
  * key's hash — hash equality only, key bytes are never verified.
  *
  * Spark shape: the table and the probe set are both projected to
  * `hash(key)` and joined on that single column; the (small) probe side
  * is broadcast, so the table never shuffles. Equal to the exact key
  * join whenever the hash is collision-free over the key population —
  * the reference mandates the 64-bit family for associative files
  * (`HashFile2Builder.java:80-84`: "Associative HashFiles must use long
  * hash to reduce collisions!") precisely to keep collisions rare; the
  * 32-bit
  * variant exists here so tests can MANUFACTURE a collision (birthday
  * bound ~2^16) and pin the bag semantics: a probe retrieves every
  * colliding key's values, by design.
  */
object KvLookup {

  private def hashOf(c: Column, kernel: String, longHash: Boolean): Column =
    if (longHash) graft_hash64(c, kernel) else graft_hash32(c, kernel).cast("long")

  /** `get(key)`: the first table row per probed key under the caller's
    * TOTAL `order` — the reference's first-value lookup
    * (`FileOperations2.java` get; RigorousHashFileTestBase.java:74-90
    * first-value contract). The order must be total, or rank 1 is
    * engine-dependent.
    *
    * `broadcastProbes = true` (default) pins the point-lookup shape: the
    * probe keys broadcast, the big table never shuffles for the join,
    * and the per-key window sorts only the semi-joined slice. For probe
    * sets too large to broadcast — beyond lookup semantics, effectively
    * a join workload — pass false: the planner/AQE picks SMJ/SHJ from
    * stats, so a huge probe set degrades to a shuffle instead of OOMing
    * the driver at collect-to-broadcast time. */
  def getFirst(table: DataFrame, keyCol: String,
      probes: DataFrame, probeKeyCol: String,
      order: Seq[Column], broadcastProbes: Boolean = true): DataFrame = {
    val probeKeys = probes.select(F.col(probeKeyCol).as(keyCol)).distinct()
    val probeSide = if (broadcastProbes) F.broadcast(probeKeys) else probeKeys
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(order: _*)
    table.join(probeSide, keyCol)
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1)
      .drop("__rn")
  }

  /** All table rows whose `hash(keyCol)` equals `hash(probeKeyCol)` of
    * any probe row — the associative `getMulti`. The probe side is
    * deduplicated on the hash before broadcast so duplicate probes don't
    * multiply output rows (the reference probes a hash table: one probe
    * per distinct hash).
    *
    * `broadcastProbes = true` (default) pins the point-lookup shape: the
    * big table never shuffles. For probe sets too large to broadcast
    * (beyond lookup semantics — effectively a join workload), pass
    * false and the planner/AQE picks the join strategy from stats. */
  def multiGetByHash(table: DataFrame, keyCol: String,
      probes: DataFrame, probeKeyCol: String,
      kernel: String = "murmur2", longHash: Boolean = true,
      broadcastProbes: Boolean = true): DataFrame = {
    val h = "__graft_kh"
    val probeHashes = probes
      .select(hashOf(F.col(probeKeyCol), kernel, longHash).as(h))
      .distinct()
    val probeSide = if (broadcastProbes) F.broadcast(probeHashes) else probeHashes
    table
      .withColumn(h, hashOf(F.col(keyCol), kernel, longHash))
      .join(probeSide, h)
      .drop(h)
  }
}
