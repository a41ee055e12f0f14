package graft.spark

import org.apache.spark.sql.{functions => F}

import graft.SparkEntry
import graft.data.TranscriptFixture

/** Pins the claims the transcript-native contract queries rest on:
  * fixture determinism + shape, the Bloom FP-free regime, the HLL
  * error-bound flag, and salted == unsalted aggregation equality.
  * (The queries' value-level correctness is oracle-checked by the
  * driver; these are the regime preconditions the oracles assume.) */
class TranscriptContractSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001" // transcript queries ignore sfDir

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("fixture is deterministic, Zipf-skewed, and turn-ordered") {
    val t = TranscriptFixture.frame(spark)
    // regenerating (not re-reading the dump) is row-identical
    val regen = graft.data.TranscriptGen.generate(spark, TranscriptFixture.Seed,
      TranscriptFixture.NConvs, TranscriptFixture.HotTurns, TranscriptFixture.MinTurns)
    assert(t.exceptAll(regen.toDF()).isEmpty && regen.toDF().exceptAll(t).isEmpty)
    // hotspot: conv 0 owns HotTurns turns; median conversation owns MinTurns
    val counts = t.groupBy("conv_id").count()
    val hot = counts.filter(F.col("conv_id") === "conv-00000")
      .head().getLong(1)
    assert(hot == TranscriptFixture.HotTurns)
    val median = counts.select(F.percentile_approx(F.col("count"), F.lit(0.5), F.lit(1000)))
      .head().getLong(0)
    assert(median == TranscriptFixture.MinTurns)
    // ts strictly increasing in turn_idx within each conversation
    val bad = t.groupBy("conv_id").agg(
      F.max(F.col("turn_idx")).as("mx"), F.count(F.lit(1)).as("n"),
      F.countDistinct(F.col("ts")).as("nts"))
      .filter(F.col("mx") =!= F.col("n") - 1 || F.col("nts") =!= F.col("n"))
    assert(bad.isEmpty)
  }

  test("bloom conv membership runs FP-free at fixture scale") {
    val out = run("transcript_bloom_convs").collect().map(_.getString(0)).toSet
    val exact = TranscriptFixture.frame(spark).select("conv_id").distinct()
      .collect().map(_.getString(0))
      .filter(c => c.stripPrefix("conv-").toInt % 2 == 0).toSet
    assert(out == exact)
  }

  test("hll estimates land inside the contract's bound flag") {
    val flags = run("transcript_hll_tools").collect().map(r => r.getBoolean(2))
    assert(flags.nonEmpty && flags.forall(identity))
  }

  test("salted hotspot rollup equals the unsalted aggregation") {
    val t = TranscriptFixture.frame(spark)
    val plain = t.groupBy("conv_id")
      .agg(F.count(F.lit(1)).as("n_turns"),
        F.sum(F.length(F.col("text")).cast("long")).as("n_chars"))
      .orderBy(F.col("n_turns").desc, F.col("conv_id")).limit(20)
    val salted = run("transcript_salted_hotspot")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("cms pair counts are exact in the collision-free regime") {
    val t = TranscriptFixture.frame(spark)
    val exact = t.groupBy(F.concat_ws(":", F.col("role"),
        F.coalesce(F.col("tool"), F.lit("-"))).as("pair"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = run("transcript_cms_role_tool").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }
}
