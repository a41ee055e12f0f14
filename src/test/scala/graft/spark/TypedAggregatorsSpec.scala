package graft.spark

import org.apache.spark.sql.{functions => F}

import graft.spark.functions._

case class TypedRow(conv: String, len: Double)

/** Typed Aggregator facades must produce byte-identical sketches to the
  * untyped Column aggregates — same buffers, same kernels, different API. */
class TypedAggregatorsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = (0 until 20000).map(i =>
    TypedRow(s"conv-${i % 3000}", (i % 997).toDouble))
  private lazy val ds = spark.createDataset(rows).repartition(7).cache()

  test("typed hllDistinct / hllSketch match the untyped aggregate bit-for-bit") {
    val typedEst = ds.select(typed.hllDistinct[TypedRow](_.conv, 12)).head()
    val untypedEst = ds.toDF().agg(hll_distinct(F.col("conv"), 12)).head().getLong(0)
    assert(typedEst === untypedEst)
    val typedBytes = ds.select(typed.hllSketch[TypedRow](_.conv, 12)).head()
    val untypedBytes = ds.toDF().agg(hll_sketch(F.col("conv"), 12))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(typedBytes, untypedBytes))
  }

  test("typed bloomSketch bytes equal the untyped aggregate; probes agree") {
    val typedBytes = ds.select(typed.bloomSketch[TypedRow](_.conv, 4000, 12)).head()
    val untypedBytes = ds.toDF().agg(bloom_sketch(F.col("conv"), 4000, 12))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(typedBytes, untypedBytes))
    assert(graft.sketch.BloomSketch.deserialize(typedBytes).contains("conv-17"))
  }

  test("typed kll/tdigest quantiles within bounds; grouped typed aggregation works") {
    val p50 = ds.select(typed.kllQuantile[TypedRow](_.len, 0.5, 200)).head()
    assert(math.abs(p50 - 498.0) <= 997 * 3 * graft.sketch.KllSketch.epsilon(200))
    val t50 = ds.select(typed.tdigestQuantile[TypedRow](_.len, 0.5)).head()
    assert(math.abs(t50 - 498.0) <= 25.0)
    // KeyValueGroupedDataset path
    val grouped = ds.groupByKey(_.conv.takeRight(1))
      .agg(typed.hllDistinct[TypedRow](_.conv, 12))
      .collect().toMap
    assert(grouped.size === 10)
    grouped.values.foreach(v => assert(v > 0))
  }

  test("typed cmsSketch estimates upper-bound exact counts") {
    val bytes = ds.select(typed.cmsSketch[TypedRow](_.conv)).head()
    val cms = graft.sketch.CmsSketch.deserialize(bytes)
    assert(cms.estimate("conv-0") >= rows.count(_.conv == "conv-0"))
  }
}
