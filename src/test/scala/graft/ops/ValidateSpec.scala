package graft.ops

import org.apache.spark.sql.{functions => F}

import graft.spark.SparkTestBase

/** Validate (one-pass expectations gate) over hand-computed corpora. */
class ValidateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, Some(10L), "O", 5.0),
    (2L, Some(20L), "F", -1.0), // range violation
    (3L, None, "O", 7.5), // null custkey
    (3L, Some(10L), "X", 2.0), // duplicate key + bad status
    (4L, Some(99L), "P", 0.0) // dangling custkey + range violation (> 0)
  ).toDF("k", "ck", "st", "price")

  private lazy val dim = Seq(10L, 20L).toDF("ck")

  test("report counts violations with null-predicate = violation") {
    val m = Validate.report(rows,
      Seq(
        "ck_not_null" -> F.col("ck").isNotNull,
        "price_positive" -> (F.col("price") > 0.0),
        "status_valid" -> F.col("st").isin("O", "F", "P")),
      Seq("k_unique" -> Seq("k")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(m("ck_not_null") === ((5L, 1L, false)))
    assert(m("price_positive") === ((5L, 2L, false)))
    assert(m("status_valid") === ((5L, 1L, false)))
    assert(m("k_unique") === ((5L, 1L, false)))
  }

  test("null comparison results count as violations, not passes") {
    val df = Seq[(Long, Option[Double])]((1L, Some(2.0)), (2L, None))
      .toDF("k", "v")
    val m = Validate.report(df, Seq("v_pos" -> (F.col("v") > 0.0)))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // v > 0 is NULL for the null row -> violation
    assert(m("v_pos") === 1L)
  }

  test("multi-column uniqueness counts full-row duplicates") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("k", "s")
    val m = Validate.report(df, Nil, Seq("ks_unique" -> Seq("k", "s")))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(m("ks_unique") === 1L)
  }

  test("refViolations counts dangling and NULL foreign keys") {
    val out = Validate.refViolations(rows, "ck_in_dim", F.col("ck"), dim,
      F.col("ck")).collect()
    assert(out.length === 1)
    // row 3 (null ck) + row 4 (ck=99 dangling)
    assert(out(0).getString(0) === "ck_in_dim")
    assert(out(0).getLong(1) === 5L)
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getBoolean(3) === false)
  }

  test("all-pass gate reports passed=true everywhere") {
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val out = Validate.combine(
      Validate.report(clean,
        Seq("v_pos" -> (F.col("v") > 0.0)), Seq("k_unique" -> Seq("k"))),
      Validate.refViolations(clean, "k_in_k", F.col("k"), clean, F.col("k")))
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getBoolean(3)))
    assert(out.map(_.getString(0)).toSeq === out.map(_.getString(0)).sorted.toSeq)
  }

  test("empty input passes explicitly: zero violations, never a NULL gate") {
    val empty = rows.filter(F.lit(false))
    val out = Validate.report(empty,
      Seq("price_positive" -> (F.col("price") > 0)),
      Seq("unique_k" -> Seq("k"))).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(1) === 0L) // n_rows
      assert(!r.isNullAt(2) && r.getLong(2) === 0L) // n_violations
      assert(!r.isNullAt(3) && r.getBoolean(3)) // passed = true, not NULL
    }
  }

  test("combine rejects a frame that is not a report") {
    val e = intercept[IllegalArgumentException] {
      Validate.combine(rows)
    }
    assert(e.getMessage.contains("report schema"))
  }

  test("report is one pass: a parquet-backed gate scans the file once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_validate").toString
    rows.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Validate.report(df,
      Seq("ck_not_null" -> F.col("ck").isNotNull,
        "price_positive" -> (F.col("price") > 0.0)),
      Seq("k_unique" -> Seq("k")))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected a single scan, plan:\n$plan")
  }
}
