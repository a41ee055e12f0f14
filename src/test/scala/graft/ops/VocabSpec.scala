package graft.ops

import org.apache.spark.sql.{functions => F}

import graft.spark.SparkTestBase

/** Vocab (adjacent-pair counting for BPE-style vocabulary induction). */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("pairCounts by hand: ordered pairs, short docs contribute nothing") {
    val df = Seq(
      "a b a b c",  // pairs: (a,b) x2, (b,a), (b,c)
      "a",          // single token: nothing
      "",           // empty: nothing
      "b  c"        // double space collapses: (b,c)
    ).toDF("text")
    val got = Vocab.pairCounts(df, "text").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 2L))
  }

  test("pairCounts equals the sliding-window brute force on the corpus") {
    val brute = docs.select(Decontaminate.tokens(F.col("text")).as("t"))
      .as[Seq[String]].collect()
      .flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    val got = Vocab.pairCounts(docs, "text").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === brute)
    // total pair mass = sum over docs of max(n_tokens - 1, 0)
    val mass = docs.select(F.sum(F.greatest(
      F.size(Decontaminate.tokens(F.col("text"))) - 1, F.lit(0))))
      .collect()(0).getLong(0)
    assert(got.values.sum === mass)
  }

  test("topPairs takes the k most frequent with a deterministic tie cut") {
    val full = Vocab.pairCounts(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = full.sortBy { case (w1, w2, c) => (-c, w1, w2) }.take(10)
    val got = Vocab.topPairs(docs, "text", 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected.toSeq)
    // the plan is TakeOrdered, not a global sort
    val plan = Vocab.topPairs(docs, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }
}
