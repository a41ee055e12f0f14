package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.spark.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator; each is a function
  * (spark, sfDir) => DataFrame over the driver's parquet tables. Every
  * query with an exact SQL equivalent also appears in `oracleSql`
  * (DuckDB-validated); sketch estimates are not SQL-expressible, so those
  * entries are rows-only checked here and bound-checked in ScalaTest.
  *
  * Column names are aligned between Spark and SQL because the driver's
  * compare sorts columns by name before hashing.
  */
object SparkEntry {

  private def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Sketch-aggregate rollup over lineitem: per (returnflag, linestatus)
    * group, exact counts + HLL distinct orders + KLL quantile of qty. */
  def entry(spark: SparkSession): DataFrame = {
    val li = read(spark, "/root/testdata/sf0.001", "lineitem")
    li.groupBy(F.col("l_returnflag"), F.col("l_linestatus"))
      .agg(
        F.count(F.lit(1)).as("n_rows"),
        hll_distinct(F.col("l_orderkey"), 14).as("approx_orders"),
        kll_quantile(kll_sketch(F.col("l_quantity"), 200), F.lit(0.5)).as("median_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hash projections (SURVEY.md §2.1): exact per-row values — checked
    // rows-only by the driver (DuckDB has no murmur2 variant), pinned
    // bit-exactly by HashGoldenSpec + the reference differential.
    "hash64_projection" -> ((s, dir) => {
      read(s, dir, "orders")
        .select(F.col("o_orderkey"),
          graft_hash64(F.col("o_orderstatus")).as("h_murmur"),
          graft_hash64(F.col("o_orderpriority"), "jenkins").as("h_jenkins"),
          graft_hash32(F.col("o_orderpriority"), "fnv1a").as("h_fnv1a32"))
        .orderBy("o_orderkey")
    }),

    // exact grouped aggregation (anchor for the oracle plumbing)
    "q1_agg" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .groupBy(F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(
          F.sum(F.col("l_quantity")).as("sum_qty"),
          F.sum(F.col("l_extendedprice")).as("sum_price"),
          F.count(F.lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // sketch aggregates (SURVEY.md §2.2, §2.6): estimates with exact
    // counterparts asserted within published bounds in SketchQuerySpec
    "sketch_distinct" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .agg(
          hll_distinct(F.col("l_orderkey"), 14).as("approx_orders"),
          hll_distinct(F.col("l_partkey"), 14).as("approx_parts"))
    }),

    "sketch_quantiles" -> ((s, dir) => {
      val sk = read(s, dir, "lineitem").agg(kll_sketch(F.col("l_extendedprice"), 200).as("sk"))
      sk.select(
        kll_quantile(F.col("sk"), F.lit(0.25)).as("p25"),
        kll_quantile(F.col("sk"), F.lit(0.5)).as("p50"),
        kll_quantile(F.col("sk"), F.lit(0.95)).as("p95"))
    }),

    // bloom-filtered semi-join (ckblm analog, SURVEY.md §2.4). Keys stay
    // LongType: integral keys canonicalize to 8-byte binary, which routes
    // through the murmur2 kernel's full mixing loop — short decimal
    // strings would instead hit the reference's seed-by-index/leading-
    // digit correlation and its catastrophic FPR (see BloomSketch docs).
    "bloom_probe_members" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
      val built = orders.filter(F.col("o_orderstatus") === "F")
      val sketch = built.agg(
        bloom_sketch(F.col("o_orderkey"), 100000, 16)).head().getAs[Array[Byte]](0)
      // probe the full table; members always pass, non-members pass at
      // FPR ~0.62^16 (~ none at this scale) — rows-only checked
      orders.filter(bloom_might_contain(F.lit(sketch), F.col("o_orderkey")))
        .select(F.col("o_orderkey")).orderBy("o_orderkey")
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
