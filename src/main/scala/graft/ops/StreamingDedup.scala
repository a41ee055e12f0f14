package graft.ops

import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, functions => F}

import graft.spark.functions.murmur64

/** Streaming exact deduplication: emit only the FIRST occurrence of each
  * distinct document content across the lifetime of the stream.
  *
  * Identity is the engine's canonical content hash (murmur64 of the text,
  * like batch `Dedup.exactDedup`), so batch-deduped and stream-deduped
  * corpora agree on what "duplicate" means. Custom state via
  * `flatMapGroupsWithState`: one boolean per distinct hash in the state
  * store; within a micro-batch the minimum id wins (deterministic
  * regardless of partitioning).
  *
  * Scale note: state grows O(distinct contents) — the state store shards
  * it per hash across executors, but an unbounded corpus needs the
  * compaction path: periodically snapshot the seen-hash set into a Bloom
  * bank (SketchBuildJob) and pre-filter the stream with
  * `ProbeJob.probeBank(reverse = true)` so the stateful stage only sees
  * probable-new contents. The Bloom false-positive rate then bounds how
  * many true duplicates slip into the stateful stage, never correctness.
  */
object StreamingDedup {

  /** Internal row shape of the stateful stage (public: the generated
    * encoder deserializer must be able to construct it). */
  case class Doc(id: Long, text: String, h: Long)

  /** Dedup-group key for null texts. A 2^-64 collision with a real text's
    * hash would merely merge two dedup groups — same exposure every
    * hash-keyed group in this engine accepts. */
  private val NullTextSentinel: Long = 0x6e756c6c2d746578L // "null-tex"

  /** Append-mode transform for a streaming DataFrame with a long id
    * column and a string text column: keeps first-seen texts only.
    * Null-id rows are dropped (nothing to emit for them); null-text rows
    * form their own dedup group under a sentinel hash, mirroring batch
    * `exactDedup`'s grouping of the null content hash. */
  def firstSeen(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(F.col(idCol).isNotNull)
      .select(F.col(idCol).cast("long").as("id"), F.col(textCol).as("text"),
        F.coalesce(murmur64(F.col(textCol)), F.lit(NullTextSentinel)).as("h"))
      .as[Doc]
      .groupByKey(_.h)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_.id)
            Iterator((first.id, first.text))
          }
      }
      .toDF(idCol, textCol)
  }
}
