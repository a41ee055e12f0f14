package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{functions => F}

import graft.spark.SparkTestBase

/** Conversations (render / truncate-to-budget / SFT pair extraction)
  * over a hand-computed transcript fixture.
  */
class ConversationsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  // conv a: user/assistant/tool/assistant; conv b: single user turn
  private lazy val turns = Seq(
    ("a", 0, "user", "hello there", null.asInstanceOf[String], ts(0)),
    ("a", 1, "assistant", "hi how can i help", null.asInstanceOf[String], ts(1)),
    ("a", 2, "tool", "result 42", "python", ts(2)),
    ("a", 3, "assistant", "the answer is 42", "python", ts(3)),
    ("b", 0, "user", "lone opener", null.asInstanceOf[String], ts(4))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  private val line = Conversations.turnLine(
    F.col("role"), F.col("tool"), F.col("text"))

  test("render: stable turn order, tool markers, one row per conversation") {
    // shuffle the input rows; the rendered sample must not care
    val shuffled = turns.orderBy(F.rand(7))
    val out = Conversations.render(shuffled, "conv_id", "turn_idx", line)
      .orderBy("conv_id").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) ===
      """<|user|> hello there
        |<|assistant|> hi how can i help
        |<|tool:python|> result 42
        |<|assistant:python|> the answer is 42""".stripMargin)
    assert(out(0).getLong(2) === 4L)
    assert(out(1).getString(1) === "<|user|> lone opener")
    assert(out(1).getLong(2) === 1L)
  }

  test("truncateToBudget keeps exactly the longest fitting suffix") {
    val nTok = F.size(F.split(F.col("text"), " "))
    // conv a token counts by turn: 2, 5, 2, 4 (suffix sums 13, 11, 6, 4)
    def kept(budget: Long) =
      Conversations.truncateToBudget(turns, "conv_id", "turn_idx", nTok, budget)
        .filter(F.col("conv_id") === "a")
        .select("turn_idx", "suffix_tokens").orderBy("turn_idx")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(kept(13) === Seq((0, 13L), (1, 11L), (2, 6L), (3, 4L)))
    assert(kept(11) === Seq((1, 11L), (2, 6L), (3, 4L)))
    assert(kept(10) === Seq((2, 6L), (3, 4L)))
    assert(kept(5) === Seq((3, 4L)))
    assert(kept(3) === Seq.empty) // even the last turn exceeds the budget
    assert(kept(0) === Seq.empty)
  }

  test("contextTargetPairs: k-frame contexts over unfiltered turns") {
    val out = Conversations.contextTargetPairs(
      turns, "conv_id", "turn_idx", "text", line,
      F.col("role") === "assistant", k = 2)
      .orderBy("conv_id", "target_idx").collect()
    // conv a assistant turns at idx 1 and 3; conv b has none
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 1), ("a", 3)))
    // idx 1: only one preceding turn exists -> single-line context
    assert(out(0).getString(2) === "<|user|> hello there")
    assert(out(0).getString(3) === "hi how can i help")
    // idx 3: the 2-frame holds idx 1 and 2 — the TOOL turn is in the
    // context even though targets are filtered to assistants (lags run
    // before the filter; filtering first would splice non-adjacent turns)
    assert(out(1).getString(2) ===
      "<|assistant|> hi how can i help\n<|tool:python|> result 42")
    assert(out(1).getString(3) === "the answer is 42")
  }

  test("contextTargetPairs excludes conversation openers") {
    val out = Conversations.contextTargetPairs(
      turns, "conv_id", "turn_idx", "text", line,
      F.col("role") === "user", k = 3)
      .collect()
    // both user turns are at idx 0 (no preceding turn) -> nothing
    assert(out.isEmpty)
  }

  test("single-shuffle plans: render groups once, truncate windows once") {
    val rendered = Conversations.render(turns, "conv_id", "turn_idx", line)
    val nEx = "Exchange".r.findAllIn(
      rendered.queryExecution.executedPlan.toString).length
    assert(nEx === 1, "render must shuffle exactly once (on conv_id)")
    val trunc = Conversations.truncateToBudget(
      turns, "conv_id", "turn_idx", F.lit(1), 10L)
    val nEx2 = "Exchange".r.findAllIn(
      trunc.queryExecution.executedPlan.toString).length
    assert(nEx2 === 1, "truncate must shuffle exactly once (on conv_id)")
  }
}
