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

  /** The state-compaction companion to [[firstSeen]]: a partitioned
    * Bloom bank (one filter per hash-range part) over the content hashes
    * of an ALREADY-SEEN corpus. Snapshot past epochs into this bank,
    * drop their entries from the state store, and pre-filter the live
    * stream with [[firstSeenCompacted]] — state then carries only the
    * current epoch's novel hashes instead of the corpus's full history. */
  def seenBank(seen: DataFrame, textCol: String,
      nParts: Int, maxSizePerPart: Long, bitsPerItem: Int = 16): DataFrame = {
    import graft.spark.functions.bloom_sketch
    seen
      .select(F.coalesce(murmur64(F.col(textCol)), F.lit(NullTextSentinel)).as("__h"))
      .withColumn("__part", F.pmod(F.col("__h"), F.lit(nParts.toLong)).cast("int"))
      .groupBy("__part")
      .agg(bloom_sketch(F.col("__h"), maxSizePerPart, bitsPerItem).as("__bloom"))
  }

  /** [[firstSeen]] behind a Bloom-bank prefilter — the compaction path
    * the scale note describes. Rows whose content hash the bank contains
    * are dropped BEFORE the stateful stage (a stream-static join routed
    * on the bank's hash-range part, the `probeBank` shape), so the state
    * store never re-accumulates past epochs' hashes.
    *
    * Approximation contract, stated precisely: the bank has no false
    * negatives, so a document seen in a snapshot epoch can NEVER be
    * re-emitted; a Bloom false positive drops a genuinely new document,
    * at most at the bank's configured FPR. For training-data dedup that
    * trade (lose ~FPR of novel docs, bound state by the current epoch)
    * is the standard one; pipelines that cannot lose any novel document
    * keep the exact [[firstSeen]] and its O(all-distinct) state. */
  def firstSeenCompacted(df: DataFrame, idCol: String, textCol: String,
      bank: DataFrame, nParts: Int): DataFrame = {
    import graft.spark.functions.bloom_bank_contains
    val routed = df
      .withColumn("__h",
        F.coalesce(murmur64(F.col(textCol)), F.lit(NullTextSentinel)))
      .withColumn("__part", F.pmod(F.col("__h"), F.lit(nParts.toLong)).cast("int"))
    val joined = routed.join(
      bank.select(F.col("__part"), F.col("__bloom")).hint("SHUFFLE_HASH"),
      Seq("__part"), "left")
    // a part with NO bank row means the snapshot saw no hashes there —
    // definitely new, keep the row. (bloom_bank_contains's null => "might
    // contain" is for RESUMABLE probe banks where a missing part is
    // merely unbuilt; a compaction bank from seenBank is complete by
    // construction, and an incomplete one must be finished first or
    // seen-but-dropped hashes in its missing parts would re-emit.)
    val seenBefore = F.col("__bloom").isNotNull &&
      bloom_bank_contains(F.col("__part"), F.col("__bloom"), F.col("__h"))
    val fresh = joined.filter(!seenBefore).drop("__part", "__bloom", "__h")
    firstSeen(fresh, idCol, textCol)
  }

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
