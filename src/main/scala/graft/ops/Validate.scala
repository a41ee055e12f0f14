package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Declarative data-quality validation — the expectations gate a
  * training-data pipeline runs before a corpus snapshot is blessed
  * (not-null, range, set-membership, uniqueness, referential
  * integrity), evaluated with the fewest possible passes over the data.
  *
  * All row-level predicates and all uniqueness constraints evaluate in
  * ONE aggregation job ([[report]]): the exchange carries one row of
  * counters per partition, never the data, so adding a check costs one
  * counter, not one scan — the difference between a profiler and a
  * production gate at corpus scale. Referential checks
  * ([[refViolations]]) are each one left join + count (Catalyst
  * broadcasts the distinct dimension-key side when it fits, and AQE
  * falls back to a shuffle join when it does not).
  *
  * Violation semantics: a row violates a check when its predicate is
  * NULL or false (SQL three-valued logic would otherwise let a null
  * sneak past a range check). A NULL foreign key violates referential
  * integrity — pair the column with an explicit not-null check to tell
  * the two failure modes apart.
  */
object Validate {

  private val ReportCols = Seq("check_name", "n_rows", "n_violations", "passed")

  /** Evaluate all `rowChecks` (name -> predicate that must hold) and
    * `uniqueChecks` (name -> key columns that must be unique) over `df`
    * in a single aggregation pass. Output, one row per check:
    * (check_name, n_rows, n_violations, passed). */
  def report(df: DataFrame, rowChecks: Seq[(String, Column)],
      uniqueChecks: Seq[(String, Seq[String])] = Nil): DataFrame = {
    val names = (rowChecks.map(_._1) ++ uniqueChecks.map(_._1))
    require(names.nonEmpty, "at least one check required")
    require(names.distinct.size == names.size, "check names must be unique")
    val violationCounters =
      rowChecks.map { case (n, pred) =>
        F.sum(F.when(F.coalesce(pred, F.lit(false)), 0L).otherwise(1L))
          .as(s"__v_$n")
      } ++
      uniqueChecks.map { case (n, cols) =>
        require(cols.nonEmpty, s"unique check '$n' needs key columns")
        // duplicates = rows minus distinct keys; a struct is never NULL,
        // so null-keyed rows still collide with each other
        (F.count(F.lit(1)) -
          F.count_distinct(F.struct(cols.map(F.col): _*))).as(s"__v_$n")
      }
    val oneRow = df.agg(
      F.count(F.lit(1)).as("__n"), violationCounters: _*)
    // sum() over zero rows is SQL NULL — an empty corpus must PASS
    // (0 violations) explicitly, not return an un-filterable NULL gate
    val entries = names.map { n =>
      F.struct(F.lit(n).as("check_name"),
        F.coalesce(F.col(s"__v_$n"), F.lit(0L)).as("n_violations"))
    }
    oneRow
      .select(F.col("__n"), F.explode(F.array(entries: _*)).as("__c"))
      .select(F.col("__c.check_name"), F.col("__n").as("n_rows"),
        F.col("__c.n_violations"),
        (F.col("__c.n_violations") === 0L).as("passed"))
  }

  /** Referential-integrity check: one (check_name, n_rows,
    * n_violations, passed) row counting `df` rows whose `key` has no
    * match among `dimKey` values in `dim`. NULL keys never match, so
    * they count as violations. */
  def refViolations(df: DataFrame, name: String, key: Column,
      dim: DataFrame, dimKey: Column): DataFrame = {
    val keys = dim.select(dimKey.as("__k")).distinct()
      .withColumn("__hit", F.lit(1))
    df.select(key.as("__k"))
      .join(keys, Seq("__k"), "left")
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.sum(F.when(F.col("__hit").isNull, 1L).otherwise(0L))
          .as("n_violations"))
      .select(F.lit(name).as("check_name"), F.col("n_rows"),
        F.col("n_violations"), (F.col("n_violations") === 0L).as("passed"))
  }

  /** Union per-check report frames (all must carry the [[report]]
    * schema) into one ordered gate result. */
  def combine(reports: DataFrame*): DataFrame = {
    require(reports.nonEmpty)
    reports.foreach(r => require(r.columns.toSeq == ReportCols,
      s"report schema mismatch: ${r.columns.mkString(",")}"))
    reports.reduce(_.unionByName(_)).orderBy("check_name")
  }
}
