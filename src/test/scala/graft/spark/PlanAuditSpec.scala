package graft.spark

import graft.SparkEntry

/** Automated physical-plan audit of the ENTIRE driver contract: every
  * `SparkEntry.queries` entry is built against sf0.001 and its executed
  * plan checked for the anti-patterns that kill a query at corpus scale.
  *
  * - `CartesianProduct` (the non-broadcast all-pairs join) is banned
  *   outright — even the deliberate brute-force ANN baseline crosses
  *   against a BROADCAST query set, never a shuffled cartesian.
  * - `BroadcastNestedLoopJoin` is allowed only where a broadcast cross
  *   is the documented design (the brute-force ANN baseline); anywhere
  *   else it means a join lost its equi-join key.
  *
  * New queries are audited automatically by construction — the round-3
  * review did this by hand; this spec makes it a regression gate. */
class PlanAuditSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose documented shape is a broadcast cross join: the
    * brute-force ANN baseline; the 1-row sketch-threshold broadcast of
    * the KLL-driven length filter; the 1-row total-token broadcast of
    * the LM scorer; and the exhaustive-regime MinHash whose probe-all
    * bucket is a constant — Catalyst folds the constant-key equi-join
    * into a broadcast cross, which is the RIGHT plan for the bounded
    * deliberate all-pairs slice (a hash join on a constant key would
    * route every row through one partition). */
  private val allowBroadcastCross = Set("similarity_topk",
    "pipeline_length_filter", "ngram_lm_score", "minhash_dups_exact",
    // simhash exact twin: probeAll single shared bucket — same
    // constant-key fold as minhash_dups_exact, same bounded slice
    "simhash_dups_exact",
    // the PQ ADC scan crosses the corpus codes against the BROADCAST
    // query set — the brute-force ANN design with an m-lookup kernel
    "pq_topk", "pq_topk_exact")

  test("no driver query plans a cartesian; broadcast crosses only where designed") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => failures += s"$name failed to plan: $e"; "" }
      if (plan.contains("CartesianProduct")) {
        failures += s"$name plans a CartesianProduct"
      }
      if (!allowBroadcastCross(name) && plan.contains("BroadcastNestedLoopJoin")) {
        failures += s"$name plans an unexpected BroadcastNestedLoopJoin"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
