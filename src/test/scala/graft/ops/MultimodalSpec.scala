package graft.ops

import org.apache.spark.sql.{functions => F}

import graft.spark.SparkTestBase

/** Multimodal plumbing tests: deterministic generation, size-aware
  * partitioning, stubbed decode/resize/frame-sample pipelines, and
  * binary dedup — everything except the codec itself, which is an
  * explicit stub. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val assets = Multimodal.generateAssets(spark, 300).cache()

  test("asset generation is deterministic and well-formed") {
    val a = Multimodal.generateAssets(spark, 50).collect().sortBy(_.asset_id)
    val b = Multimodal.generateAssets(spark, 50).collect().sortBy(_.asset_id)
    a.zip(b).foreach { case (x, y) =>
      assert(x.asset_id === y.asset_id)
      assert(java.util.Arrays.equals(x.content, y.content))
    }
    assert(a.map(_.kind).toSet === Set("image", "audio", "video"))
    a.foreach { x =>
      assert(x.content.length >= 1024)
      if (x.kind == "audio") assert(x.width === 0 && x.duration_ms > 0)
      if (x.kind == "image") assert(x.width > 0 && x.duration_ms === 0)
    }
  }

  test("size-aware repartitioning balances bytes, not rows") {
    val df = Multimodal.repartitionBySize(assets.toDF(), "content", 1L << 20)
    val total = assets.toDF().agg(F.sum(F.length($"content"))).head().getLong(0)
    val expectParts = math.max(1, math.ceil(total / (1L << 20).toDouble).toInt)
    assert(df.rdd.getNumPartitions === expectParts)
  }

  test("decode/resize pipeline: deterministic fingerprints, schema, partition-count independent") {
    val decoded = Multimodal.decodeImages(assets)
    val nImages = assets.filter(_.kind == "image").count()
    assert(decoded.count() === nImages)
    val resized = Multimodal.resizeImages(decoded, 224, 224)
    assert(resized.filter(d => d.width != 224 || d.height != 224).count() === 0)
    // determinism across partitionings
    val r1 = resized.collect().sortBy(_.asset_id).map(_.pixels_fingerprint).toSeq
    val r2 = Multimodal.resizeImages(
      Multimodal.decodeImages(assets.repartition(13)), 224, 224)
      .collect().sortBy(_.asset_id).map(_.pixels_fingerprint).toSeq
    assert(r1 === r2)
  }

  test("frame sampling explodes one row per sampled frame, bounded by duration") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000).cache()
    val videos = assets.filter(_.kind == "video").collect()
    val expected = videos.map(v => math.max(1, v.duration_ms / 1000)).sum
    assert(frames.count() === expected)
    // per-asset frame indices are dense from 0
    val bad = frames.groupByKey(_.asset_id).mapGroups { (_, it) =>
      val idx = it.map(_.frame_idx).toSeq.sorted
      if (idx == idx.indices.toSeq) 0 else 1
    }.filter(_ == 1).count()
    assert(bad === 0)
  }

  test("binary dedup: planted content duplicates collapse") {
    val doubled = assets.toDF().select($"asset_id", $"content")
      .unionAll(assets.toDF().select(($"asset_id" + 10000).as("asset_id"), $"content"))
    import org.apache.spark.sql.Encoders
    val kept = Multimodal.dedupAssets(
      doubled.withColumn("kind", F.lit("image"))
        .withColumn("width", F.lit(1)).withColumn("height", F.lit(1))
        .withColumn("duration_ms", F.lit(0)).withColumn("format", F.lit("png"))
        .as[Multimodal.Asset](Encoders.product[Multimodal.Asset]))
    assert(kept.count() === assets.count())
    assert(kept.agg(F.max("asset_id")).head().getLong(0) < 10000)
  }
}
