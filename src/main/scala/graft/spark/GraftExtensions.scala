package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.agg.{BloomAgg, BloomMergeAgg, CmsAgg, CmsMergeAgg, CmsWeightedAgg, HeavyHittersAgg, HeavyHittersMergeAgg, HllAgg, HllMergeAgg, KllAgg, KllMergeAgg, TDigestAgg, TDigestMergeAgg, TopKByAgg, VecMeanAgg}
import graft.spark.expr._

/** SQL registration for the engine: `spark.sql("SELECT graft_hash64(x)...")`.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.spark.GraftExtensions`. Only function
  * injection is needed — the core pipeline composes Spark built-ins, and
  * Catalyst's existing rules (pushdown, pruning, partial agg, AQE) do the
  * optimizing (SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case Literal(v, _) => String.valueOf(v)
    case other => throw new IllegalArgumentException(
      s"argument must be a literal, got $other")
  }

  private def litInt(e: Expression): Int = lit(e).toInt
  private def litLong(e: Expression): Long = lit(e).toLong

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))

    register("graft_hash64", {
      case Seq(c) => GraftHash64(c, "murmur2")
      case Seq(c, k) => GraftHash64(c, lit(k))
    })
    register("graft_hash32", {
      case Seq(c) => GraftHash32(c, "murmur2")
      case Seq(c, k) => GraftHash32(c, lit(k))
    })
    register("graft_hash64_seeded", {
      case Seq(c, seed) => GraftHash64Seeded(c, seed, "murmur2")
      case Seq(c, seed, k) => GraftHash64Seeded(c, seed, lit(k))
    })
    register("graft_hash64_k", {
      case Seq(c, k) => GraftHash64K(c, k, "murmur2")
      case Seq(c, k, kern) => GraftHash64K(c, k, lit(kern))
    })
    register("graft_hash32_seeded", {
      case Seq(c, seed) => GraftHash32Seeded(c, seed, "murmur2")
      case Seq(c, seed, k) => GraftHash32Seeded(c, seed, lit(k))
    })
    register("graft_hash32_k", {
      case Seq(c, k) => GraftHash32K(c, k, "murmur2")
      case Seq(c, k, kern) => GraftHash32K(c, k, lit(kern))
    })
    register("bloom_sketch", {
      case Seq(c, maxSize, bpi) =>
        BloomAgg(c, litLong(maxSize), litInt(bpi)).toAggregateExpression()
      case Seq(c, maxSize, bpi, kern) =>
        BloomAgg(c, litLong(maxSize), litInt(bpi), lit(kern)).toAggregateExpression()
      // 5-arg form exposes the reference's int-hash family
      // (`BloomFilter.java:167-191`): longHash=false probes with
      // getIntHashCodes semantics
      case Seq(c, maxSize, bpi, kern, longHash) =>
        BloomAgg(c, litLong(maxSize), litInt(bpi), lit(kern),
          longHash = lit(longHash).toBoolean).toAggregateExpression()
    })
    register("hh_sketch", {
      case Seq(c) => HeavyHittersAgg(c, 256).toAggregateExpression()
      case Seq(c, cap) => HeavyHittersAgg(c, litInt(cap)).toAggregateExpression()
    })
    register("hh_sketch_weighted", {
      case Seq(c, w) => HeavyHittersAgg(c, 256, Some(w)).toAggregateExpression()
      case Seq(c, w, cap) =>
        HeavyHittersAgg(c, litInt(cap), Some(w)).toAggregateExpression()
    })
    register("cms_sketch_weighted", {
      case Seq(k, w) => CmsWeightedAgg(k, w, 5, 1 << 14).toAggregateExpression()
      case Seq(k, w, d, width) =>
        CmsWeightedAgg(k, w, litInt(d), litInt(width)).toAggregateExpression()
    })
    register("hh_merge", { case Seq(c) => HeavyHittersMergeAgg(c).toAggregateExpression() })
    register("hh_topk", { case Seq(s, k) => HhTopK(s, k) })
    register("hh_estimate", { case Seq(s, i) => HhEstimate(s, i) })
    // SQL-caller contract: within a task, all rows with a given part id
    // must carry the same sketch value (the one-row-per-part join shape;
    // see BloomBankContains scaladoc) — the per-task cache is keyed by
    // part id alone so hits never deserialize the binary column again.
    register("bloom_bank_contains", { case Seq(p, s, v) => BloomBankContains(p, s, v) })
    // misuse-proof variant: cache keyed on (part, sketch-bytes content),
    // sketch evaluated per row — mixed sketches under one part id each
    // get their own filter (correct-but-slower instead of silently stale)
    register("bloom_bank_contains_strict",
      { case Seq(p, s, v) => BloomBankContains(p, s, v, strict = true) })
    register("top_k_by", {
      case Seq(v, score, k) => TopKByAgg(v, score, litInt(k)).toAggregateExpression()
    })
    register("vec_mean", { case Seq(v) => VecMeanAgg(v).toAggregateExpression() })
    register("cosine_similarity",
      { case Seq(a, b) => graft.ops.CosineSimExpr(a, b) })
    register("srp_signature", {
      case Seq(v, bits) => graft.ops.SrpSignatureExpr(v, litInt(bits), 42L)
      case Seq(v, bits, seed) => graft.ops.SrpSignatureExpr(v, litInt(bits), litLong(seed))
    })
    register("srp_multiprobe", {
      case Seq(v, bits, seed, nflip) =>
        graft.ops.SrpMultiprobeExpr(v, litInt(bits), litLong(seed), litInt(nflip))
    })
    register("hll_sketch", {
      case Seq(c) => HllAgg(c, 14).toAggregateExpression()
      case Seq(c, p) => HllAgg(c, litInt(p)).toAggregateExpression()
      case Seq(c, p, kern) => HllAgg(c, litInt(p), lit(kern)).toAggregateExpression()
    })
    register("cms_sketch", {
      case Seq(c) => CmsAgg(c, 5, 1 << 14).toAggregateExpression()
      case Seq(c, d, w) => CmsAgg(c, litInt(d), litInt(w)).toAggregateExpression()
      case Seq(c, d, w, kern) =>
        CmsAgg(c, litInt(d), litInt(w), lit(kern)).toAggregateExpression()
    })
    register("kll_sketch", {
      case Seq(c) => KllAgg(c, 200).toAggregateExpression()
      case Seq(c, k) => KllAgg(c, litInt(k)).toAggregateExpression()
    })
    register("tdigest_sketch", {
      case Seq(c) => TDigestAgg(c, 100.0).toAggregateExpression()
      case Seq(c, d) => TDigestAgg(c, lit(d).toDouble).toAggregateExpression()
    })
    register("tdigest_merge", { case Seq(c) => TDigestMergeAgg(c).toAggregateExpression() })
    register("tdigest_quantile", { case Seq(s0, q) => TDigestQuantile(s0, q) })
    register("bloom_merge", { case Seq(c) => BloomMergeAgg(c).toAggregateExpression() })
    register("hll_merge", { case Seq(c) => HllMergeAgg(c).toAggregateExpression() })
    register("cms_merge", { case Seq(c) => CmsMergeAgg(c).toAggregateExpression() })
    register("kll_merge", { case Seq(c) => KllMergeAgg(c).toAggregateExpression() })
    register("bloom_might_contain", { case Seq(s, c) => BloomMightContain(s, c) })
    register("hll_estimate", { case Seq(s) => HllEstimate(s) })
    // "graft_" prefix: Spark 4.1 ships a BUILTIN hll_union (Datasketches
    // binary format) — registering under the same name would silently
    // shadow it in extension-enabled sessions and then fail on its
    // sketches. Every graft SQL name must avoid builtin collisions.
    register("graft_hll_union", { case Seq(a, b) => HllUnion(a, b) })
    register("cms_estimate", { case Seq(s, c) => CmsEstimate(s, c) })
    register("kll_quantile", { case Seq(s, q) => KllQuantile(s, q) })
    register("kll_rank", { case Seq(s, v) => KllRank(s, v) })
    register("kll_histogram", { case Seq(s, b) => KllHistogram(s, b) })
  }
}
