package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Vocabulary-induction primitives: corpus-wide adjacent-token-pair
  * frequencies — the counting step a BPE/WordPiece trainer iterates
  * (count pairs, merge the winner, re-count). One full merge loop is a
  * driver-side iteration over [[pairCounts]]; the expensive part — the
  * corpus-scale count — is what has to distribute, and it is a pure
  * explode + partial-aggregated count here (map-side combine collapses
  * the pair stream before the only shuffle; the exchange carries
  * (pair, count), never token streams).
  */
object Vocab {

  /** Adjacent token-pair frequencies over `textCol` (tokenization =
    * [[Decontaminate.tokens]]: split on single space, drop empties).
    * Output: (w1, w2, cnt) — one row per distinct ordered pair;
    * documents with fewer than two tokens contribute nothing.
    */
  def pairCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = Decontaminate.tokens(F.col(textCol))
    val n = F.size(t)
    df.select(
        F.slice(t, F.lit(1), F.greatest(n - 1, F.lit(0))).as("__l"),
        F.slice(t, F.lit(2), F.greatest(n - 1, F.lit(0))).as("__r"))
      .select(F.explode(F.arrays_zip(F.col("__l"), F.col("__r"))).as("__p"))
      .select(F.col("__p.__l").as("w1"), F.col("__p.__r").as("w2"))
      .groupBy("w1", "w2").agg(F.count(F.lit(1)).as("cnt"))
  }

  /** The `k` most frequent adjacent pairs (ties broken by (w1, w2) so
    * the answer is a deterministic set — the next BPE merge candidates).
    * `orderBy.limit` compiles to TakeOrderedAndProject: per-partition
    * top-k then a k-row merge, never a global sort. */
  def topPairs(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    pairCounts(df, textCol)
      .orderBy(F.col("cnt").desc, F.col("w1"), F.col("w2"))
      .limit(k)
  }
}
