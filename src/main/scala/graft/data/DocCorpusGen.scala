package graft.data

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.ByteOps
import graft.core.hash.Murmur2Kernel

/** A synthetic web document — schema-identical to the driver fixture's
  * `documents` table (TESTDATA.md) so every SparkEntry query runs
  * unmodified over a generated directory. */
case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

/** A synthetic embedding row — schema-identical to the fixture's
  * `embeddings` table. */
case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

/** Deterministic, distributed documents+embeddings synthesizer for
  * scale-evidence runs (VERDICT r4 "Next round #1"): the same dedup/CC/ANN
  * queries, executed at 1x and >=10x the sf0.1 fixture, on a corpus whose
  * *per-document workload stays constant as the corpus grows* — which is
  * the regime a real 100 TB crawl is in, and the one the sf fixtures are
  * not: the fixture's ~32-word vocabulary makes every trigram's inverted
  * list grow linearly with corpus size, so candidate pairs grow
  * quadratically and ANY engine looks superlinear on it. Real corpora
  * grow their vocabulary with size (Heaps' law), keeping shingle
  * frequencies — and hence candidates per document — roughly flat.
  *
  * Concretely:
  *   - vocabulary size scales linearly with nDocs (vocab = nDocs/5,
  *     floor 1000), sampled Zipf(s=1.07) by rank, so common words stay
  *     common but the tail grows with the corpus;
  *   - ~5% of documents are near-copies of an earlier document with a
  *     0–10% token-mutation rate (spanning the 0.5 and 0.7 Jaccard
  *     thresholds), so near-dup pairs and cluster counts grow ~linearly;
  *   - ~20% of documents embed one of nDocs/100 shared 10-token
  *     boilerplate phrases (web-boilerplate shape) feeding line_dedup and
  *     duplicate_spans with real cross-document repetition at constant
  *     density;
  *   - embeddings are unit vectors around 16 fixed centroids (matching
  *     semantic_dedup's nlist=16) with ~4% planted jittered near-copies
  *     (cos > 0.999).
  *
  * Like TranscriptGen, every row is a pure function of (seed, id) via
  * counter-mode murmur hashing — no stateful PRNG — so generation fans
  * out from spark.range and is byte-identical at any parallelism.
  */
object DocCorpusGen {

  @inline private def draw(seed: Long, key: String): Long =
    Murmur2Kernel.hash64Seeded(ByteOps.utf8(key), seed)

  @inline private def pick(seed: Long, key: String, bound: Int): Int =
    Math.floorMod(draw(seed, key), bound.toLong).toInt

  /** Deterministic pseudo-word for vocabulary rank r (3–10 letters).
    * Rank 0 is the most frequent word under the Zipf draw below. */
  def word(r: Int): String = {
    val h = Murmur2Kernel.hash64(s"dw:$r")
    val len = 3 + Math.floorMod(h, 8L).toInt
    val sb = new StringBuilder(len)
    var x = h | 1L
    var i = 0
    while (i < len) {
      sb += ('a' + Math.floorMod(x, 26L).toInt).toChar
      x = ByteOps.rotateLong(x * 0x9e3779b97f4a7c13L, 13) ^ (x >>> 7)
      i += 1
    }
    sb.toString
  }

  /** Zipf-ish rank draw over [0, vocab) by inverse-CDF on a uniform
    * double; the approximation rank = floor(vocab^u)-1 for u ~ U(0,1)
    * gives a heavy head and a long tail (log-uniform ≈ Zipf s=1) without
    * a per-call harmonic-number table (exactness is irrelevant here —
    * only the *shape* matters, and it is deterministic).
    *
    * The raw murmur draw MUST be avalanched before its top bits are
    * used: the reference's murmur2-64 variant ends `h ^= h >> 47` with a
    * SIGNED shift, which XORs the sign bit with itself — bit 63 is
    * structurally 0 (a 63-bit hash). Consuming `draw >>> 11` directly
    * capped u below 0.5 and silently shrank the effective vocabulary to
    * sqrt(vocab) (caught when a 10k-word corpus exhausted BPE training at
    * 488 merges). Same reason HllSketch.updateHash fmix64s its codes. */
  @inline private def zipfRank(seed: Long, key: String, vocab: Int): Int = {
    val h = graft.sketch.HllSketch.fmix64(draw(seed, key))
    val u = (h >>> 11).toDouble / (1L << 53).toDouble
    val r = math.pow(vocab.toDouble, u) - 1.0
    math.min(vocab - 1, r.toInt)
  }

  def vocabSize(nDocs: Long): Int = math.max(1000L, nDocs / 5L).min(50000000L).toInt

  def boilerplateCount(nDocs: Long): Int = math.max(50L, nDocs / 100L).min(10000000L).toInt

  /** The base (pre-plant) token stream of a document: pure in (seed, id).
    * Length 15–85 tokens like the fixture (~50 avg). */
  private def baseTokens(seed: Long, id: Long, vocab: Int): Array[String] = {
    val n = 15 + pick(seed, s"d:$id:len", 71)
    Array.tabulate(n)(t => word(zipfRank(seed, s"d:$id:w$t", vocab)))
  }

  /** A shared 10-token boilerplate phrase (pure in (seed, b)). */
  private def boilerplate(seed: Long, b: Int, vocab: Int): Array[String] =
    Array.tabulate(10)(t => word(zipfRank(seed, s"bp:$b:w$t", vocab)))

  /** Final token stream: base, or a mutated near-copy of an EARLIER
    * document's base stream (never of its final stream — that keeps this
    * non-recursive and clusters small), plus an optional boilerplate
    * splice.
    *
    * `hotPermille` > 0 additionally makes that fraction (per mille) of
    * documents mutated near-copies of doc 0 — ONE giant near-dup cluster,
    * the Zipf-hotspot stress for the CC/candidate-join paths (VERDICT r4
    * next #8). 0 (the default) leaves existing corpora byte-identical. */
  def tokensFor(seed: Long, id: Long, nDocs: Long, hotPermille: Int = 0): Array[String] = {
    val vocab = vocabSize(nDocs)
    if (hotPermille > 0 && id > 0 && pick(seed, s"d:$id:hot", 1000) < hotPermille) {
      val base = baseTokens(seed, 0L, vocab)
      val rate = pick(seed, s"d:$id:hrate", 11)
      return base.zipWithIndex.map { case (w, t) =>
        if (rate > 0 && pick(seed, s"d:$id:hm$t", 100) < rate)
          word(zipfRank(seed, s"d:$id:hw$t", vocab))
        else w
      }
    }
    val toks0 =
      if (id > 20 && pick(seed, s"d:$id:dup", 100) < 5) {
        val back = 1 + pick(seed, s"d:$id:base", math.min(id, 1000L).toInt)
        val base = baseTokens(seed, id - back, vocab)
        // mutation rate 0–10%: spans the 0.5/0.7 Jaccard thresholds
        val rate = pick(seed, s"d:$id:rate", 11)
        base.zipWithIndex.map { case (w, t) =>
          if (rate > 0 && pick(seed, s"d:$id:m$t", 100) < rate)
            word(zipfRank(seed, s"d:$id:mw$t", vocab))
          else w
        }
      } else baseTokens(seed, id, vocab)
    if (pick(seed, s"d:$id:bp", 100) < 20) {
      val phrase = boilerplate(seed, pick(seed, s"d:$id:bpi", boilerplateCount(nDocs)), vocab)
      val at = pick(seed, s"d:$id:bpat", toks0.length + 1)
      val (pre, post) = toks0.splitAt(at)
      pre ++ phrase ++ post
    } else toks0
  }

  def doc(seed: Long, id: Long, nDocs: Long, hotPermille: Int = 0): Doc = {
    val text = tokensFor(seed, id, nDocs, hotPermille).mkString(" ")
    Doc(id, text, "en", "src" + (id % 20), text.length.toLong)
  }

  /** The resolved NON-dup base id when `id` is a planted near-copy,
    * None for a base row. Follows the redirection chain to a non-dup
    * row: a dup whose drawn base is itself a dup would otherwise jitter
    * a vector no row stores (row b stores base(b's own base), not
    * base(b)) — an orphan plant with no cos>0.999 partner, ~0.16% of
    * rows. Chains shrink strictly (b < id), stop at id <= 20, expected
    * length 1/(1-0.04). */
  private[data] def embBase(seed: Long, id: Long): Option[Long] =
    if (id > 20 && pick(seed, s"e:$id:dup", 100) < 4) {
      var b = id - 1 - pick(seed, s"e:$id:base", math.min(id, 1000L).toInt)
      while (b > 20 && pick(seed, s"e:$b:dup", 100) < 4)
        b = b - 1 - pick(seed, s"e:$b:base", math.min(b, 1000L).toInt)
      Some(b)
    } else None

  /** 64-dim unit embedding around one of 16 centroids; ~4% are jittered
    * near-copies of an earlier BASE vector (cosine > 0.999 by
    * construction: jitter magnitude 1e-4 per component on a unit
    * vector; [[embBase]] guarantees the referenced row stores the base
    * exactly, so every plant has a real partner). */
  def emb(seed: Long, id: Long): Emb = {
    val (baseId, jitter) = embBase(seed, id) match {
      case Some(b) => (b, true)
      case None => (id, false)
    }
    val label = pick(seed, s"e:$baseId:lab", 16)
    val v = new Array[Float](64)
    var norm = 0.0
    var i = 0
    while (i < 64) {
      // centroid component (pure in label) + per-vector noise
      val c = Math.floorMod(draw(seed, s"cent:$label:$i"), 2001L) / 1000.0 - 1.0
      val n = Math.floorMod(draw(seed, s"e:$baseId:n$i"), 2001L) / 1000.0 - 1.0
      val x = c + 0.3 * n
      v(i) = x.toFloat
      norm += x * x
      i += 1
    }
    val inv = (1.0 / math.sqrt(math.max(norm, 1e-12))).toFloat
    i = 0
    while (i < 64) {
      v(i) *= inv
      if (jitter) v(i) += (Math.floorMod(draw(seed, s"e:$id:j$i"), 201L) - 100L) * 1e-6f
      i += 1
    }
    Emb(id, v, label)
  }

  def generateDocs(spark: SparkSession, seed: Long, nDocs: Long,
      hotPermille: Int = 0): Dataset[Doc] = {
    import spark.implicits._
    spark.range(nDocs)
      .repartition(spark.sparkContext.defaultParallelism)
      .map(i => doc(seed, i, nDocs, hotPermille))
  }

  def generateEmbs(spark: SparkSession, seed: Long, nVecs: Long): Dataset[Emb] = {
    import spark.implicits._
    spark.range(nVecs)
      .repartition(spark.sparkContext.defaultParallelism)
      .map(i => emb(seed, i))
  }

  /** Write a SparkEntry-compatible directory: documents.parquet +
    * embeddings.parquet. */
  def write(spark: SparkSession, dir: String, seed: Long,
      nDocs: Long, nVecs: Long, hotPermille: Int = 0): Unit = {
    generateDocs(spark, seed, nDocs, hotPermille)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    generateEmbs(spark, seed, nVecs)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
