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

  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val spark = JobSession.get("graft-probe")
    val df = spark.read.parquet(argMap("--input"))
    probe(df, argMap("--sketch"), argMap("--key"),
      argMap.get("--reverse").exists(_.toBoolean))
      .write.mode("overwrite").parquet(argMap("--out"))
    spark.stop()
  }
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
