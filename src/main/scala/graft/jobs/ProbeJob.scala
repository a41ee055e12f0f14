package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.spark.functions._

/** Membership filter over a saved Bloom sketch — the `ckblm` analog
  * (`cmd/ckblm.java:34-78`): emit rows whose key is (probably) in the
  * filter, or with `reverse`, rows that are definitely NOT in it (the
  * anti-filter; Bloom guarantees no false negatives, so the reverse
  * filter is exact). The sketch loads once on the driver and travels as
  * a literal, so the probe is a broadcast-style scan with no shuffle and
  * no join — O(rows) work, O(sketch) memory per executor.
  */
object ProbeJob {

  def probe(df: DataFrame, sketchFile: String, keyCol: String,
      reverse: Boolean = false): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(sketchFile))
    val pred = bloom_might_contain(F.lit(bytes), F.col(keyCol))
    df.filter(if (reverse) !pred else pred)
  }

  /** Probe a SketchBuildJob Bloom BANK: per-part filters from
    * `<buildOut>/parts`, routed by the same content hash that
    * partitioned the build (`part_id = murmur64(key) mod nParts`). The
    * bank (nParts rows) is collected and broadcast; each executor lazily
    * deserializes each part's filter once. Scale shape: probe cost is a
    * scan + O(1) lookup per row; bank memory is O(distinct/parts *
    * bitsPerItem * nParts / 8) — independent of corpus row count. */
  def probeBank(spark: SparkSession, df: DataFrame, buildOut: String,
      keyCol: String, reverse: Boolean = false): DataFrame = {
    import graft.data.TranscriptTable.PartCol
    val bankRows = spark.read.parquet(s"$buildOut/parts")
      .select(F.col(PartCol), F.col("bloom_conv")).collect()
    require(bankRows.nonEmpty, s"empty bloom bank at $buildOut/parts")
    // route with the modulus the TABLE was built with (recorded in the
    // build manifest) — an incomplete bank must not change routing
    val nParts = SketchBuildJob.recordedNParts(buildOut).getOrElse(
      throw new IllegalStateException(
        s"$buildOut/_manifest/config.json missing; cannot derive bank routing"))
    val bank = bankRows.map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val bankBc = spark.sparkContext.broadcast(bank)
    // Bloom semantics for a part whose filter is not built yet: we cannot
    // prove absence, so "might contain" = true (and reverse = false)
    val contains = F.udf((part: Int, key: String) =>
      if (key == null) false
      else bankBc.value.get(part) match {
        case Some(bytes) => BankCache.get(bankBc.value, part, bytes).contains(key)
        case None => true
      })
    val part = F.pmod(graft.spark.functions.murmur64(F.col(keyCol)),
      F.lit(nParts.toLong)).cast("int")
    val pred = contains(part, F.col(keyCol))
    df.filter(if (reverse) !pred else pred)
  }

  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val spark = JobSession.get("graft-probe")
    val df = spark.read.parquet(argMap("--input"))
    val reverse = argMap.get("--reverse").exists(_.toBoolean)
    val filtered = argMap.get("--bank") match {
      case Some(buildOut) => probeBank(spark, df, buildOut, argMap("--key"), reverse)
      case None => probe(df, argMap("--sketch"), argMap("--key"), reverse)
    }
    filtered.write.mode("overwrite").parquet(argMap("--out"))
    spark.stop()
  }
}

/** Per-executor deserialized-filter cache for Bloom-bank probes: each
  * part's filter is deserialized at most once per JVM. Returned sketches
  * are shared across task threads — safe because `BloomSketch.contains`
  * is thread-safe (it allocates its k-vector locally). Cache keys carry
  * the bytes' length alongside the bank's identity hash so a (rare)
  * identityHashCode collision between different banks cannot alias. */
private[jobs] object BankCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), graft.sketch.BloomSketch]()

  def get(bank: Map[Int, Array[Byte]], part: Int, bytes: Array[Byte]): graft.sketch.BloomSketch =
    cache.computeIfAbsent((System.identityHashCode(bank), part, bytes.length),
      _ => graft.sketch.BloomSketch.deserialize(bytes))
}

/** Full-scan dump in stable order — the `dumphf` analog
  * (`cmd/dumphf.java:31-56`): the whole table as TSV ordered by
  * (conv_id, turn_idx), the ordering under which the reference's
  * insertion-order contract (`RigorousHashFileTestBase.java:74-90`) maps
  * to transcripts. */
object DumpJob {
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val spark = JobSession.get("graft-dump")
    spark.read.parquet(argMap("--input"))
      .orderBy("conv_id", "turn_idx")
      .write.mode("overwrite").option("sep", "\t").csv(argMap("--out"))
    spark.stop()
  }
}
