package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}

import graft.spark.functions.top_k_by

/** Deterministic sampling primitives for training-data curation. */
object Sampling {

  /** Stratified deterministic sample: the k rows per stratum with the
    * SMALLEST values of `orderCol`. With a collision-free order column
    * (e.g. an odd-multiplier multiplicative hash of a unique id, which
    * is a bijection mod 2^32) this is a reproducible uniform sample with
    * a total order — rerunnable byte-for-byte on any cluster layout.
    *
    * Runs as the mergeable `top_k_by` aggregation: map-side k-heaps per
    * stratum, the exchange moves k rows per (stratum, task). A
    * `row_number() OVER (PARTITION BY stratum ORDER BY h)` window would
    * instead serialize every stratum through one reducer partition —
    * with few strata (languages, sources) that is a handful of reducers
    * sorting the whole corpus.
    *
    * Output: (strataCol, idCol, sample_order) with sample_order the
    * orderCol value, ascending per stratum. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      orderCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.select(F.col(strataCol), F.col(idCol), orderCol.cast("double").as("__h"))
      .groupBy(F.col(strataCol))
      .agg(top_k_by(F.col(idCol), -F.col("__h"), k).as("__topk"))
      .select(F.col(strataCol), F.explode(F.col("__topk")).as("__e"))
      .select(F.col(strataCol), F.col("__e.value").as(idCol),
        (-F.col("__e.score")).as("sample_order"))
  }

  /** Weighted sample WITHOUT replacement per stratum (Efraimidis &
    * Spirakis 2006, algorithm A-ES): each row gets the key u^(1/w) with
    * u uniform in (0,1) and w its weight; the k largest keys per
    * stratum are a weighted sample without replacement. With u derived
    * from a collision-free id hash ((h + 0.5) / 2^32) the sample is
    * fully deterministic and reproducible.
    *
    * Distribution shape is the same mergeable `top_k_by` k-heap as
    * [[stratifiedSample]]: map-side partial heaps, k rows per stratum
    * per task across the exchange — the A-ES key trick is exactly what
    * makes weighted sampling MERGEABLE, and is why it is the standard
    * distributed weighted sampler. */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: Column, hashCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // fold the hash into the unsigned 32-bit ring: a SIGNED hash (raw
    // murmur32) would give u < 0, pow(u, 1/w) = NaN, and the NaN keys
    // would be silently skipped by the heap — a shrunken, biased sample
    // with no error. pmod is the identity for already-unsigned inputs.
    val u = (F.pmod(hashCol.cast("long"), F.lit(4294967296L)).cast("double") +
      F.lit(0.5)) / F.lit(4294967296.0)
    // A-ES is defined for w > 0; a negative w would make u^(1/w) > 1 and
    // silently dominate the sample, so non-positive weights are excluded
    // (null keys are skipped by the top_k_by heap)
    val w = weightCol.cast("double")
    val key = F.when(w > 0, F.pow(u, F.lit(1.0) / w))
    df.select(F.col(strataCol), F.col(idCol), key.as("__key"))
      .groupBy(F.col(strataCol))
      .agg(top_k_by(F.col(idCol), F.col("__key"), k).as("__topk"))
      .select(F.col(strataCol), F.posexplode(F.col("__topk")).as(Seq("__pos", "__e")))
      .select(F.col(strataCol), F.col("__e.value").as(idCol),
        (F.col("__pos") + 1).cast("long").as("rank"))
  }

  /** Deterministic holdout split: assigns each row the first label whose
    * cumulative fraction of the 2^32 hash space covers `hashCol` — the
    * standard reproducible train/valid/test assignment, stable under
    * any repartitioning and any insertion order, and trivially
    * rerunnable (membership is a pure function of the id hash).
    * Fractions must sum to 1; thresholds are floor(cum * 2^32), so
    * power-of-two fractions split exactly. Pure projection: no shuffle,
    * no state. */
  def hashSplit(df: DataFrame, hashCol: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * 4294967296.0).toLong)
    // fold into the unsigned 32-bit ring first — the same signed-hash
    // trap weightedSample/mixtureSample guard: a raw signed hash would
    // send every negative value (~half the rows) into the first label
    val u = F.pmod(hashCol.cast("long"), F.lit(4294967296L))
    val split = fractions.zip(bounds).init.foldRight(
      F.lit(fractions.last._1): Column) { case (((label, _), bound), rest) =>
      F.when(u < bound, F.lit(label)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Deterministic mixture sampling: down-sample each stratum at its own
    * target rate — the training-data MIXING step (re-weighting languages
    * / sources / quality buckets toward a target distribution). A row is
    * kept iff its 32-bit id hash lands below floor(rate(stratum)·2^32),
    * so power-of-two rates cut the hash space exactly.
    *
    * Pure projection + filter: no shuffle, no state, stable under any
    * partitioning — the one sampling shape that costs literally nothing
    * extra at corpus scale. With a bijective id hash the kept set is
    * exactly reproducible, and samples are NESTED across rates
    * (rate r1 <= r2 ⇒ keep(r1) ⊆ keep(r2)), which is what makes
    * mixture re-tuning cheap: lowering a stratum's rate only removes
    * rows, it never reshuffles the kept set.
    *
    * Strata absent from `rates` fall back to `defaultRate`. The hash is
    * folded into the unsigned 32-bit ring first (same signed-hash trap
    * as [[weightedSample]]). */
  def mixtureSample(df: DataFrame, stratumCol: String, hashCol: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    def thr(r: Double): Long = math.floor(r * 4294967296.0).toLong
    // deterministic CASE chain (sorted keys) so the plan is stable
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      F.lit(thr(defaultRate)): Column) { case ((s, r), rest) =>
      F.when(F.col(stratumCol) === s, F.lit(thr(r))).otherwise(rest)
    }
    val u = F.pmod(hashCol.cast("long"), F.lit(4294967296L))
    df.filter(u < threshold)
  }
}
