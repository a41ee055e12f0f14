package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.spark.functions.murmur64

/** Row-level diff of two corpus snapshots — the incremental-update
  * primitive of a recurring crawl/ingest pipeline: classify every
  * document id as added / removed / changed / unchanged between the
  * previous snapshot and the current one, so downstream stages
  * (dedup state, embedding index, sketch banks) can be updated over
  * the delta instead of rebuilt over the world.
  *
  * Shape at scale: both sides project to (id, murmur64(content))
  * BEFORE the full-outer join, so the exchange carries 16 bytes per
  * row, never document bodies — the [[Dedup.exactDedup]] hash
  * discipline applied to change detection. Equality via 64-bit content
  * hash has the standard collision caveat (a colliding changed doc
  * would read "unchanged"); `verifyByText = true` joins the raw
  * content column instead for pipelines that need certainty, at the
  * cost of shuffling the bodies.
  */
object SnapshotDiff {

  def diff(previous: DataFrame, current: DataFrame, idCol: String,
      textCol: String, verifyByText: Boolean = false): DataFrame = {
    // explicit presence flags, NOT null-hash sentinels: a row whose
    // content is null hashes to null and would otherwise be mistaken
    // for an absent row; content equality is null-safe for the same
    // reason (null content on both sides = unchanged)
    def proj(df: DataFrame, p: String, h: String) = {
      val content = if (verifyByText) F.col(textCol) else murmur64(F.col(textCol))
      df.select(F.col(idCol), F.lit(true).as(p), content.as(h))
    }
    proj(previous, "__pp", "__hp")
      .join(proj(current, "__pc", "__hc"), Seq(idCol), "full_outer")
      .select(F.col(idCol),
        F.when(F.col("__pp").isNull, "added")
          .when(F.col("__pc").isNull, "removed")
          .when(F.col("__hp") <=> F.col("__hc"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
