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
    // nonEmpty first: a bare foreach passes vacuously if top-value
    // profiling silently returns an empty list
    assert(lang.topValues.get.nonEmpty, "string column must report top values")
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
    // audit the PROFILER'S OWN frame — a test-local lookalike agg would
    // keep passing after the builder regressed to one pass per column
    val plan = ProfileJob.profileFrame(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profiler plan must not join:\n$plan")
    assert(plan.contains("ObjectHashAggregate"))
    // every column's sketches ride the one aggregation: no more than a
    // single partial/final aggregate pair and a single scan
    assert("ObjectHashAggregate".r.findAllIn(plan).size <= 2,
      s"profiler must stay one aggregate pair:\n$plan")
    assert("(FileScan|Scan |LocalTableScan)".r.findAllIn(plan).size <= 1,
      s"profiler must scan once:\n$plan")
  }
}
