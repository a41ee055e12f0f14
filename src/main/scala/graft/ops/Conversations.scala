package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Transcript-to-training-data shaping: the three operations every
  * conversation/agent-transcript pipeline runs between the raw turn
  * table (conv_id, turn_idx, role, text, tool, ts) and a training set —
  * chat-template rendering, context-window truncation, and SFT
  * (context, target) pair extraction.
  *
  * All three are single-shuffle shapes keyed on the conversation id:
  * rendering is one `groupBy(conv)` whose exchange carries the turn
  * payload exactly once; truncation and pair extraction are one window
  * partitioned by conv. Conversations are independent, so the work
  * parallelizes across conv_ids — the Zipf hotspot conversation bounds
  * per-task skew at (longest conversation), not (corpus size), and a
  * 10^12-turn corpus is just more partitions. Nothing here collects,
  * sorts globally, or self-joins.
  */
object Conversations {

  /** Chat-template line for one turn: `<|role|> text`, or
    * `<|role:tool|> text` when a tool was invoked. Null-safe on `tool`
    * only — a null `role`/`text` nulls the line (concat semantics),
    * which rendering then drops from the sample; the fixture schema
    * never nulls them. */
  def turnLine(role: Column, tool: Column, text: Column): Column =
    F.concat(F.lit("<|"), role,
      F.when(tool.isNotNull, F.concat(F.lit(":"), tool)).otherwise(F.lit("")),
      F.lit("|> "), text)

  /** Render each conversation into ONE training sample: turns in stable
    * `orderCol` order (the input contract's "(conv_id, turn_idx)
    * ordering" invariant), each formatted by `line`, joined with `sep`.
    * Output: (convCol, sample_text, n_turns). `n_turns` counts RENDERED
    * lines: array_join drops null elements, so a turn whose `line`
    * evaluates to null (e.g. null text) is absent from sample_text and
    * must not be counted — a consumer splitting sample_text by `sep`
    * sees exactly n_turns pieces.
    *
    * Shape: a single groupBy(conv) — collect_list gathers the partition
    * locally, array_sort orders it (collect_list order is
    * nondeterministic across retries; sorting inside the row restores
    * determinism without a global sort), and the per-row transform/join
    * is codegen'd. The exchange carries each turn once; the reduce-side
    * state per key is one conversation, bounded by the longest
    * transcript, not the corpus. */
  def render(df: DataFrame, convCol: String, orderCol: String,
      line: Column, sep: String = "\n"): DataFrame =
    df.groupBy(F.col(convCol))
      .agg(
        F.array_join(
          F.transform(
            F.array_sort(F.collect_list(
              F.struct(F.col(orderCol).as("__o"), line.as("__line")))),
            x => x.getField("__line")),
          sep).as("sample_text"),
        F.sum(F.when(line.isNotNull, 1L).otherwise(0L)).as("n_turns"))

  /** Keep, per conversation, the longest SUFFIX of turns whose summed
    * `nTokens` fits `budget` — the "truncate history to the context
    * window, keep the most recent turns" step. Adds `cumCol` = tokens
    * from this turn through the end of the conversation (the running
    * suffix total the filter is applied to). A single turn larger than
    * `budget` is itself dropped (strict `<=`), and with it everything
    * before it.
    *
    * One window shuffle on (conv); the suffix sum is monotone in
    * descending `orderCol`, so `cum <= budget` selects a contiguous
    * suffix — no second pass to find the cut point. */
  def truncateToBudget(df: DataFrame, convCol: String, orderCol: String,
      nTokens: Column, budget: Long, cumCol: String = "suffix_tokens"): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val w = Window.partitionBy(F.col(convCol)).orderBy(F.col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cumCol, F.sum(nTokens.cast("long")).over(w))
      .filter(F.col(cumCol) <= budget)
  }

  /** Extract SFT (context, target) pairs: for every row passing
    * `targetFilter` (e.g. `role === "assistant"`) with at least one
    * preceding turn, emit the previous up-to-`k` turns rendered by
    * `line` and joined with `sep` as `context_text`, and the row's
    * `textCol` as `target_text`. Output: (convCol, target_idx,
    * context_text, target_text).
    *
    * Context is assembled from `k` `lag` calls over one conv-keyed
    * window — a fixed-width frame, never a per-row list build — so the
    * state per window is k rows regardless of conversation length.
    * `concat_ws` skips the nulls that lags past the conversation start
    * produce, giving shorter contexts near the head instead of padding.
    * Lags are computed over ALL turns (filtering first would splice
    * non-adjacent turns together); `targetFilter` applies after. */
  def contextTargetPairs(df: DataFrame, convCol: String, orderCol: String,
      textCol: String, line: Column, targetFilter: Column, k: Int,
      sep: String = "\n"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(F.col(convCol)).orderBy(F.col(orderCol))
    val ctx = F.concat_ws(sep, (k to 1 by -1).map(i => F.lag(line, i).over(w)): _*)
    df.withColumn("__ctx", ctx)
      .withColumn("__has_prev", F.lag(F.col(orderCol), 1).over(w).isNotNull)
      .filter(targetFilter && F.col("__has_prev"))
      .select(F.col(convCol), F.col(orderCol).as("target_idx"),
        F.col("__ctx").as("context_text"), F.col(textCol).as("target_text"))
  }
}
