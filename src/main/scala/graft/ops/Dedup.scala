package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.spark.functions.murmur64

/** Deduplication operators for web-scale corpora. Shapes are chosen for
  * the 100 TB case:
  *
  *  - exact dedup shuffles only (hash, id), never the document bodies;
  *  - MinHash-LSH generates candidate pairs via banded signatures — the
  *    classic shingle -> minhash -> band -> bucket-join pipeline — so the
  *    self-join happens only within buckets (expected O(n * dups), not
  *    O(n^2)); the Jaccard verification re-reads text for candidate
  *    pairs only;
  *  - SimHash near-dup uses 4 x 16-bit bands of a 64-bit signature with
  *    a Hamming-distance verify (bit_count(xor) — codegen'd built-in).
  */
object Dedup {

  /** Exact duplicate groups by content hash: keeps the minimum id per
    * distinct text. Default shuffles 16 bytes/row regardless of document
    * size (64-bit collision odds at n=10^9 are negligible); pipelines
    * needing certainty pass `verifyByText = true`, which groups by
    * (hash, text) so hash collisions between different texts can never
    * merge groups — at the cost of shuffling the text column. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String,
      verifyByText: Boolean = false): DataFrame = {
    if (verifyByText) {
      df.select(F.col(idCol), murmur64(F.col(textCol)).as("__h"), F.col(textCol))
        .groupBy(F.col("__h"), F.col(textCol))
        .agg(F.min(F.col(idCol)).as(idCol))
        .select(idCol)
    } else {
      df.select(F.col(idCol), murmur64(F.col(textCol)).as("__h"))
        .groupBy(F.col("__h"))
        .agg(F.min(F.col(idCol)).as(idCol))
        .select(idCol)
    }
  }

  /** Exact duplicate pairs (loser -> kept winner), for building a purge
    * list: every id whose text already appeared under a smaller id. */
  def exactDupLosers(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = df.select(F.col(idCol), murmur64(F.col(textCol)).as("__h"))
    val winners = h.groupBy("__h").agg(F.min(idCol).as("__keep"))
    h.join(winners, "__h")
      .filter(F.col(idCol) =!= F.col("__keep"))
      .select(F.col(idCol).as("dup_id"), F.col("__keep").as("kept_id"))
  }

  /** MinHash + LSH near-duplicate pairs: signature of `numHashes`
    * min-hashes over `shingleSize`-token shingles, banded into `bands`
    * groups of r = numHashes/bands rows. Two docs collide in a bucket iff
    * one band of their signatures matches exactly; candidates are then
    * verified with exact shingle-Jaccard >= `threshold`.
    *
    * With r rows per band, the collision probability of a pair with true
    * Jaccard s is 1-(1-s^r)^bands — the standard S-curve; defaults
    * (64 hashes, 16 bands, r=4) put the knee near s ~ 0.5. */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sig = df.select(F.col(idCol),
      TextAnalysis.minhash_sig(F.col(textCol), numHashes, shingleSize).as("__sig"))

    // band b = murmur of the slice [b*r, (b+1)*r) — one row per (doc,
    // band), carrying ONLY (band, bucket, id): at corpus scale the band
    // explosion must never amplify document bodies through the shuffle
    val banded = sig.select(
      F.col(idCol),
      F.posexplode(F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), b =>
        murmur64(F.concat_ws(",",
          F.transform(F.slice(F.col("__sig"), b * r + 1, F.lit(r)), _.cast("string"))))))
        .as(Seq("__band", "__bucket")))

    // bucket-join on ids; candidate pair count is O(near-dups), tiny
    // relative to the corpus
    val left = banded.select(F.col("__band"), F.col("__bucket"), F.col(idCol).as("id_a"))
    val right = banded.select(F.col("__band"), F.col("__bucket"), F.col(idCol).as("id_b"))
    val candidateIds = left.join(right, Seq("__band", "__bucket"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // fetch text only for candidates, then exact-verify
    val textsA = df.select(F.col(idCol).as("id_a"), F.col(textCol).as("text_a"))
    val textsB = df.select(F.col(idCol).as("id_b"), F.col(textCol).as("text_b"))
    candidateIds.join(textsA, "id_a").join(textsB, "id_b")
      .withColumn("jaccard",
        TextAnalysis.jaccard_shingles(F.col("text_a"), F.col("text_b"), shingleSize))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-duplicate pairs: 64-bit signature, candidates matched
    * on any of 4 x 16-bit bands, verified by Hamming distance <=
    * `maxHamming` via the codegen'd bit_count built-in. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(F.col(idCol),
      TextAnalysis.simhash64(F.col(textCol)).as("__sim"))
    val banded = sig.select(F.col(idCol), F.col("__sim"),
      F.posexplode(F.array((0 until 4).map(b =>
        F.shiftright(F.col("__sim"), b * 16).bitwiseAND(F.lit(0xffffL))): _*))
        .as(Seq("__band", "__bucket")))
    val left = banded.select(F.col("__band"), F.col("__bucket"),
      F.col(idCol).as("id_a"), F.col("__sim").as("sim_a"))
    val right = banded.select(F.col("__band"), F.col("__bucket"),
      F.col(idCol).as("id_b"), F.col("__sim").as("sim_b"))
    left.join(right, Seq("__band", "__bucket"))
      .filter(F.col("id_a") < F.col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
      .filter(F.col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-duplicate pairs via cosine >= threshold, bucketed by
    * signed-random-projection LSH (see Similarity.srpSignature) so the
    * pair generation never goes O(n^2). Exact cosine verifies candidates. */
  def embeddingDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      srpBits: Int = 16): DataFrame = {
    // bucket on ids only; vectors are re-joined for candidate pairs so
    // the SRP bucket join never shuffles embeddings
    val sig = df.select(F.col(idCol),
      Similarity.srpSignature(F.col(vecCol), srpBits).as("__srp"))
    val left = sig.select(F.col("__srp"), F.col(idCol).as("id_a"))
    val right = sig.select(F.col("__srp"), F.col(idCol).as("id_b"))
    val candidateIds = left.join(right, Seq("__srp"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val vecsA = df.select(F.col(idCol).as("id_a"), F.col(vecCol).as("va"))
    val vecsB = df.select(F.col(idCol).as("id_b"), F.col(vecCol).as("vb"))
    candidateIds.join(vecsA, "id_a").join(vecsB, "id_b")
      .withColumn("cosine", Similarity.cosine(F.col("va"), F.col("vb")))
      .filter(F.col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
