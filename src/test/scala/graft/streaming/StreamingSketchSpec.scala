package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.OutputMode

import graft.data.{TranscriptGen, TranscriptTable}
import graft.sketch.HllSketch
import graft.spark.SparkTestBase
import graft.spark.functions._

/** Structured Streaming support: the sketch aggregates are ordinary
  * Catalyst aggregate functions with serializable buffers, so they drop
  * into streaming groupBy aggregations unchanged — the state store
  * persists the serialized sketch between micro-batches. The reference
  * has no streaming layer; this is the engine's Spark-native extension
  * (SURVEY.md §7, optional stretch).
  */
class StreamingSketchSpec extends SparkTestBase {

  test("hll/kll sketch aggregation over a file-source stream matches batch") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val data = s"$dir/in"
    TranscriptTable.write(TranscriptGen.generate(spark, 42L, 100), data, 4)

    val schema = spark.read.parquet(data).schema
    val stream = spark.readStream.schema(schema).parquet(data)
    val agg = stream.groupBy(F.col("role"))
      .agg(hll_sketch(F.col("conv_id"), 12).as("hll"),
        kll_sketch(F.length(F.col("text")), 200).as("kll"))
      .select(F.col("role"), hll_estimate(F.col("hll")).as("convs"),
        kll_quantile(F.col("kll"), F.lit(0.5)).as("len_p50"))

    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName("stream_sketches")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM stream_sketches")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

      val batch = spark.read.parquet(data).groupBy(F.col("role"))
        .agg(hll_sketch(F.col("conv_id"), 12).as("hll"),
          kll_sketch(F.length(F.col("text")), 200).as("kll"))
        .select(F.col("role"), hll_estimate(F.col("hll")).as("convs"),
          kll_quantile(F.col("kll"), F.lit(0.5)).as("len_p50"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (role, (convs, p50)) =>
        val (bConvs, _) = batch(role)
        // HLL estimates are identical (same registers); KLL judged at
        // the sketch's OWN rank bound — a loose 10% value tolerance
        // would pass a state-store merge bug several times the
        // guarantee, so the streamed p50's true rank must sit within
        // 3*eps(k=200) of the median
        assert(convs === bConvs, s"role=$role hll streamed=$convs batch=$bConvs")
        val vals = spark.read.parquet(data).filter(F.col("role") === role)
          .select(F.length(F.col("text")).cast("double"))
          .collect().map(_.getDouble(0)).sorted
        val rank = vals.count(_ <= p50).toDouble / vals.length
        assert(math.abs(rank - 0.5) <= 3 * 1.65 / 200 + 1.0 / vals.length,
          s"role=$role streamed p50=$p50 lands at rank $rank")
      }
      // accuracy vs exact ground truth
      val exact = spark.read.parquet(data).groupBy("role")
        .agg(F.countDistinct("conv_id").as("exact"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      streamed.foreach { case (role, (convs, _)) =>
        val e = exact(role)
        assert(math.abs(convs - e).toDouble / e <= 3 * HllSketch.standardError(12))
      }
    } finally q.stop()
  }

  test("streaming exact dedup: first occurrence wins across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val deduped = graft.ops.StreamingDedup.firstSeen(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try {
      // batch 1: one in-batch duplicate (min id 1 wins for "alpha")
      input.addData((3L, "alpha"), (1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
      def seen(): Set[Long] = spark.sql("SELECT doc_id FROM dedup_out")
        .collect().map(_.getLong(0)).toSet
      assert(seen() === Set(1L, 2L))
      // batch 2: cross-batch duplicate suppressed by state; new text passes
      input.addData((4L, "alpha"), (5L, "gamma"))
      q.processAllAvailable()
      assert(seen() === Set(1L, 2L, 5L))
      // null texts form their own dedup group instead of crashing the
      // query; later null texts are duplicates of it
      input.addData((6L, null), (7L, null))
      q.processAllAvailable()
      assert(seen() === Set(1L, 2L, 5L, 6L))
    } finally q.stop()
  }

  test("compacted streaming dedup: bank suppresses past epochs, state the current one") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // epoch 0 (already snapshotted): alpha + beta live only in the bank
    val past = Seq((100L, "alpha"), (101L, "beta")).toDF("doc_id", "text")
    val bank = graft.ops.StreamingDedup.seenBank(past, "text",
      nParts = 4, maxSizePerPart = 64)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val deduped = graft.ops.StreamingDedup.firstSeenCompacted(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bank, nParts = 4)
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sdc_out").start()
    try {
      def seen(): Set[Long] = spark.sql("SELECT doc_id FROM sdc_out")
        .collect().map(_.getLong(0)).toSet
      // batch 1: bank drops the epoch-0 dup; gamma is novel (min id wins)
      input.addData((1L, "alpha"), (3L, "gamma"), (2L, "gamma"))
      q.processAllAvailable()
      assert(seen() === Set(2L))
      // batch 2: bank STILL drops epoch-0 texts; gamma now suppressed by
      // STATE (cross-batch); delta is novel
      input.addData((4L, "beta"), (5L, "gamma"), (6L, "delta"))
      q.processAllAvailable()
      assert(seen() === Set(2L, 6L))
    } finally q.stop()
  }

  test("windowed streaming aggregation with watermark accepts sketch aggregates") {
    val dir = Files.createTempDirectory("graft-stream-w").toString
    val data = s"$dir/in"
    TranscriptTable.write(TranscriptGen.generate(spark, 7L, 50), data, 2)
    // the stream reads a COPY of the fixture: the punct-conv row that
    // advances the watermark in batch 2 is appended only there, so the
    // pristine fixture every ground-truth read uses is never mutated
    // (no order-dependence between reads)
    val streamSrc = s"$dir/stream"
    spark.read.parquet(data)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .write.parquet(streamSrc)
    val schema = spark.read.parquet(streamSrc).schema
    val stream = spark.readStream.schema(schema).parquet(streamSrc)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(F.window(F.col("ts"), "6 hours"), F.col("role"))
      .agg(hll_sketch(F.col("conv_id"), 12).as("hll"))
      .select(F.col("window.start").as("w"), F.col("role"),
        hll_estimate(F.col("hll")).as("convs"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("stream_windows")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: a punctuation row 30 days past max(ts) advances the
      // watermark beyond every REAL window end, so append mode emits
      // them all — a lastProgress != null check could never fail and
      // proved nothing about the emitted state
      val maxTs = spark.read.parquet(data)
        .agg(F.max(F.col("ts"))).head().getTimestamp(0)
      import spark.implicits._
      Seq(("punct-conv", 0, "system", "x", null.asInstanceOf[String],
          new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .write.mode("append").parquet(streamSrc)
      q.processAllAvailable()

      val emitted = spark.sql("SELECT * FROM stream_windows")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      // every real (window, role) group must be emitted with the same
      // HLL estimate a batch computation produces (identical registers)
      val expected = spark.read.parquet(data)
        .groupBy(F.window(F.col("ts"), "6 hours"), F.col("role"))
        .agg(hll_sketch(F.col("conv_id"), 12).as("hll"))
        .select(F.col("window.start").as("w"), F.col("role"),
          hll_estimate(F.col("hll")).as("convs"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(expected.nonEmpty)
      assert(emitted === expected,
        s"emitted ${emitted.size} groups, expected ${expected.size}")
    } finally q.stop()
  }
}
