package graft.jobs

import graft.spark.SparkTestBase

/** One-pass table profiler: per-column sketch stats within their bounds,
  * computed in a single aggregation job. */
class ProfileJobSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("profile of the documents table: counts exact, estimates within bounds") {
    val p = ProfileJob.profile(docs)
    val n = docs.count()
    assert(p.rows === n)
    val byName = p.columns.map(c => c.column -> c).toMap

    // doc_id: bigint, unique, no nulls
    val id = byName("doc_id")
    assert(id.nulls === 0L)
    assert(math.abs(id.approxDistinct.get - n).toDouble / n <=
      3 * graft.sketch.HllSketch.standardError(14))
    assert(id.quantiles.get("p50") > 0.0)

    // lang: low-cardinality string with exact heavy hitters
    val lang = byName("lang")
    val exactLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lang.approxDistinct.get === exactLang.size.toLong)
    lang.topValues.get.foreach { case (v, cnt) => assert(exactLang(v) === cnt) }

    // n_chars: numeric histogram partitions all rows
    val nc = byName("n_chars")
    val hist = nc.histogram.get
    assert(hist.map(_._3).sum === n)
    assert(hist.head._1 <= hist.last._2)
    // quantiles are monotone
    val qs = nc.quantiles.get
    assert(qs("p01") <= qs("p50") && qs("p50") <= qs("p99"))

    // JSON renders and carries every column
    val json = ProfileJob.toJson(p)
    assert(docs.schema.fieldNames.forall(f => json.contains("\"" + f + "\"")))
  }

  test("profile runs as ONE aggregation job (single-pass scan)") {
    val plan = {
      import org.apache.spark.sql.{functions => F}
      // reproduce the agg the profiler builds and check its shape: one
      // ObjectHashAggregate pair over one scan, no joins/extra exchanges
      val df = docs
      df.agg(F.count(F.lit(1)).as("r"),
        graft.spark.functions.hll_sketch(F.col("doc_id"), 14).as("h"),
        graft.spark.functions.kll_sketch(F.col("n_chars"), 200).as("k"))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Join"), s"profiler plan must not join:\n$plan")
    assert(plan.contains("ObjectHashAggregate"))
  }
}
