package graft.spark.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sketch.{BloomSketch, CmsSketch, HeavyHittersSketch, HllSketch, KllSketch, TDigestSketch}
import graft.spark.agg.ValueBytes

/** Scalar query expressions over serialized sketch buffers (BinaryType).
  *
  * Per-row deserialization would be catastrophic, so each expression
  * caches the deserialized sketch keyed on the bytes' object identity —
  * the common shape is a collected sketch broadcast as a literal, where
  * the same array instance is seen by every row. The probe itself is
  * codegen'd via a reference object, keeping whole-stage codegen intact
  * (the `ckblm`-style Bloom filter probe, `cmd/ckblm.java:63-66`, is the
  * reference's hot membership path).
  */
object SketchTypeChecks {
  def binaryFirst(prettyName: String, dt: DataType): TypeCheckResult = dt match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch as first argument, got ${other.catalogString}")
  }
  def hashable(prettyName: String, dt: DataType): TypeCheckResult =
    ValueBytes.checkSketchable(prettyName, dt)
  def exact(prettyName: String, dt: DataType, want: DataType): TypeCheckResult =
    if (dt == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${want.catalogString} argument, got ${dt.catalogString}")

  /** any numeric (incl. DECIMAL literals like SQL 0.5) accepted, converted
    * to double at eval */
  def numeric(prettyName: String, dt: DataType): TypeCheckResult = dt match {
    case _: org.apache.spark.sql.types.NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric argument, got ${other.catalogString}")
  }

  def asDouble(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case n: java.lang.Number => n.doubleValue()
  }
}

private[expr] final class SketchCache[S <: AnyRef](deser: Array[Byte] => S) extends Serializable {
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: S = _

  def get(bytes: Array[Byte]): S = {
    if (!(bytes eq lastBytes)) {
      lastSketch = deser(bytes)
      lastBytes = bytes
    }
    lastSketch
  }
}

/** `bloom_might_contain(sketchBytes, value)` — true iff all k bits set;
  * mirrors the reference `BloomFilter.contains` (`BloomFilter.java:167-191`). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.hashable(prettyName, right.dataType)
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val cache = new SketchCache(BloomSketch.deserialize)

  def contains(sketchBytes: Array[Byte], value: Any): Boolean =
    cache.get(sketchBytes).contains(ValueBytes.toBytes(value, right.dataType))

  override protected def nullSafeEval(sketch: Any, value: Any): Any =
    contains(sketch.asInstanceOf[Array[Byte]], value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (s, v) => s"${ev.value} = $ref.contains($s, $v);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}

/** `hll_estimate(sketchBytes)` — rounded distinct-count estimate. */
case class HllEstimate(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeChecks.binaryFirst(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hll_estimate"

  @transient private lazy val cache = new SketchCache(HllSketch.deserialize)

  def estimate(sketchBytes: Array[Byte]): Long =
    math.round(cache.get(sketchBytes).estimate())

  override protected def nullSafeEval(sketch: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hllExpr", this, classOf[HllEstimate].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.estimate($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** `hll_union(a, b)` — row-wise union of two serialized HLL sketches
  * (register-wise max, exactly the aggregate merge as a scalar): the
  * primitive behind sketch SET ALGEBRA over pre-aggregated sketch
  * columns — union estimate = `hll_estimate(hll_union(a, b))`,
  * intersection by inclusion-exclusion
  * (`graft.spark.functions.hll_intersect_estimate`). Deserializes
  * fresh per evaluation (the merge MUTATES, so the shared
  * [[SketchCache]] must not be used here); union rows are
  * post-aggregation — few and wide, not corpus-scale. */
case class HllUnion(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f
    else right.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch as second argument, got ${other.catalogString}")
    }
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // SQL name is graft_hll_union (Spark 4.1's builtin hll_union owns
  // this prettyName's natural spelling in the registry)
  override def prettyName: String = "hll_union"

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllSketch.deserialize(a).merge(HllSketch.deserialize(b)).serialize()

  override protected def nullSafeEval(a: Any, b: Any): Any =
    union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hllUnionExpr", this, classOf[HllUnion].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.union($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HllUnion =
    copy(left = l, right = r)
}

/** `cms_estimate(sketchBytes, key)` — upper-bounded frequency estimate. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.hashable(prettyName, right.dataType)
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cache = new SketchCache(CmsSketch.deserialize)

  def estimate(sketchBytes: Array[Byte], value: Any): Long =
    cache.get(sketchBytes).estimate(ValueBytes.toBytes(value, right.dataType))

  override protected def nullSafeEval(sketch: Any, value: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]], value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (s, v) => s"${ev.value} = $ref.estimate($s, $v);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

/** `kll_quantile(sketchBytes, q)` — value at quantile q in [0,1]. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.numeric(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_quantile"

  @transient private lazy val cache = new SketchCache(KllSketch.deserialize)

  def quantile(sketchBytes: Array[Byte], q: Double): Double =
    cache.get(sketchBytes).quantile(q)

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    quantile(sketch.asInstanceOf[Array[Byte]], SketchTypeChecks.asDouble(q))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllExpr", this, classOf[KllQuantile].getName)
    nullSafeCodeGen(ctx, ev, (s, q) =>
      s"${ev.value} = $ref.quantile($s, graft.spark.expr.SketchTypeChecks.asDouble($q));")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

/** `kll_rank(sketchBytes, v)` — approximate count of items <= v. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.numeric(prettyName, right.dataType)
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_rank"

  @transient private lazy val cache = new SketchCache(KllSketch.deserialize)

  def rank(sketchBytes: Array[Byte], v: Double): Long = cache.get(sketchBytes).rank(v)

  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    rank(sketch.asInstanceOf[Array[Byte]], SketchTypeChecks.asDouble(v))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllRankExpr", this, classOf[KllRank].getName)
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = $ref.rank($s, graft.spark.expr.SketchTypeChecks.asDouble($v));")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllRank =
    copy(left = l, right = r)
}

/** `hh_topk(sketchBytes, k)` — tracked items best-first as
  * array<struct<item, cnt, lower_bound>>: SpaceSaving guarantees
  * trueCount in [lower_bound, cnt], and counts are EXACT whenever the
  * sketch's capacity covered the distinct-key count (no evictions). */
case class HhTopK(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.exact(prettyName, right.dataType, IntegerType)
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hh_topk"

  @transient private lazy val cache = new SketchCache(HeavyHittersSketch.deserialize)

  override protected def nullSafeEval(sketch: Any, k: Any): Any = {
    val rows = cache.get(sketch.asInstanceOf[Array[Byte]])
      .topK(k.asInstanceOf[Int])
      .map { case (item, cnt, lower) =>
        InternalRow(UTF8String.fromString(item), cnt, lower)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hhTopKExpr", this, classOf[HhTopK].getName)
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) $ref.topKRows($s, $k);")
  }

  def topKRows(sketchBytes: Array[Byte], k: Int): GenericArrayData =
    nullSafeEval(sketchBytes, k).asInstanceOf[GenericArrayData]

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HhTopK =
    copy(left = l, right = r)
}

/** `hh_estimate(sketchBytes, item)` — upper-bound frequency of an item
  * (the sketch's minimum counter when untracked). */
case class HhEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.exact(prettyName, right.dataType, StringType)
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hh_estimate"

  @transient private lazy val cache = new SketchCache(HeavyHittersSketch.deserialize)

  def estimate(sketchBytes: Array[Byte], item: UTF8String): Long =
    cache.get(sketchBytes).estimate(item.toString)

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hhEstExpr", this, classOf[HhEstimate].getName)
    nullSafeCodeGen(ctx, ev, (s, v) => s"${ev.value} = $ref.estimate($s, $v);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HhEstimate =
    copy(left = l, right = r)
}

/** `bloom_bank_contains(partId, sketchBytes, value)` — membership probe
  * against a PARTITIONED Bloom bank after a part-routed join, the
  * scale-safe `ckblm` shape: instead of collecting the whole bank to the
  * driver and broadcasting it everywhere (O(nParts x filterBytes) on
  * every executor), probe rows are routed to their part's filter row and
  * this expression tests against it.
  *
  * Two things make the joined shape cheap:
  *  - the deserialized filter is cached per part id, so each part's
  *    bytes are parsed once per task, not once per row;
  *  - `doGenCode` defers evaluating the sketch column to the cache-miss
  *    branch, so on hits the (large) binary is never copied out of the
  *    joined row at all.
  *
  * Null semantics: null value or part => false (unknown key is not a
  * member); null sketch (part not built yet in a resuming bank) => TRUE —
  * Bloom can never prove absence, so an unbuilt part must not produce
  * false negatives (and the reverse/anti filter stays exact).
  *
  * CONTRACT (holds by construction for `ProbeJob.probeBank`, and is the
  * caller's obligation for the public SQL form): within a task, every row
  * carrying a given part id must carry the SAME sketch value — the
  * one-row-per-part join shape. The per-task cache is keyed by part id
  * alone (the deferred-eval codegen exists precisely so cache hits never
  * touch the binary column), so rows pairing one part id with different
  * sketch bytes — or a null row before a built row — would silently get
  * whichever filter the task saw first.
  *
  * `strict = true` (SQL: `bloom_bank_contains_strict`) removes that
  * foot-gun: the sketch column is evaluated on EVERY row and the cache
  * keys on (part, murmur64 of the bytes), so rows pairing one part id
  * with different sketches each get their own filter — misuse degrades
  * to correct-but-slower (a per-row binary copy + hash) instead of
  * silently stale. Use it for ad-hoc SQL over hand-built bank tables;
  * the join-shape fast path remains the default.
  */
case class BloomBankContains(first: Expression, second: Expression, third: Expression,
    strict: Boolean = false)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val p = SketchTypeChecks.exact(prettyName, first.dataType, IntegerType)
    if (p.isFailure) return p
    val s = SketchTypeChecks.binaryFirst(prettyName, second.dataType)
    if (s.isFailure) return s
    SketchTypeChecks.hashable(prettyName, third.dataType)
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bank_contains"

  /** fast: part id -> BloomSketch | Missing, rebuilt per deserialized
    * instance (per task) — exactly the join's co-partitioned
    * granularity. strict: (part, murmur64(bytes)) -> BloomSketch. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()

  def cached(part: Int): AnyRef = cache.get(part)

  def load(part: Int, bytes: Array[Byte]): AnyRef = {
    val sk: AnyRef =
      if (bytes == null) BloomBankContains.Missing else BloomSketch.deserialize(bytes)
    val prev = cache.putIfAbsent(part, sk)
    if (prev != null) prev else sk
  }

  def test(sk: AnyRef, value: Any): Boolean = sk match {
    case s: BloomSketch => s.contains(ValueBytes.toBytes(value, third.dataType))
    case _ => true // unbuilt part: cannot prove absence
  }

  /** Strict path: content-keyed, evaluated per row — immune to mixed
    * sketches under one part id, at the cost of a per-row binary copy
    * + hash. */
  def testStrict(part: Int, bytes: Array[Byte], value: Any): Boolean = {
    if (bytes == null) return true // unbuilt part: cannot prove absence
    val key = (part, graft.core.hash.Murmur2Kernel.hash64(bytes))
    var sk = cache.get(key)
    if (sk == null) {
      val loaded: AnyRef = BloomSketch.deserialize(bytes)
      val prev = cache.putIfAbsent(key, loaded)
      sk = if (prev != null) prev else loaded
    }
    test(sk, value)
  }

  override def eval(input: InternalRow): Any = {
    val p = first.eval(input)
    val v = third.eval(input)
    if (p == null || v == null) false
    else {
      val pid = p.asInstanceOf[Int]
      if (strict) testStrict(pid, second.eval(input).asInstanceOf[Array[Byte]], v)
      else {
        var sk = cached(pid)
        if (sk == null) sk = load(pid, second.eval(input).asInstanceOf[Array[Byte]])
        test(sk, v)
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bankExpr", this, classOf[BloomBankContains].getName)
    val p = first.genCode(ctx)
    val s = second.genCode(ctx)
    val v = third.genCode(ctx)
    val skVar = ctx.freshName("bankSketch")
    if (strict) {
      ev.copy(code = code"""
        ${p.code}
        ${v.code}
        boolean ${ev.value} = false;
        if (!${p.isNull} && !${v.isNull}) {
          ${s.code}
          ${ev.value} = $ref.testStrict(${p.value},
            ${s.isNull} ? null : ${s.value}, ${v.value});
        }""", isNull = FalseLiteral)
    } else {
      ev.copy(code = code"""
        ${p.code}
        ${v.code}
        boolean ${ev.value} = false;
        if (!${p.isNull} && !${v.isNull}) {
          Object $skVar = $ref.cached(${p.value});
          if ($skVar == null) {
            ${s.code}
            $skVar = $ref.load(${p.value}, ${s.isNull} ? null : ${s.value});
          }
          ${ev.value} = $ref.test($skVar, ${v.value});
        }""", isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BloomBankContains =
    copy(first = f, second = s, third = t)
}

object BloomBankContains {
  /** Sentinel for a routed part with no built filter yet. */
  case object Missing
}

/** `kll_histogram(sketchBytes, nBins)` — equal-width histogram over the
  * sketch's [min, max] value range as array<struct<lo, hi, cnt>>; bin
  * counts come from rank differences, so each carries the sketch's eps*n
  * rank-error bound. The profiling primitive: one pass builds the
  * sketch, the histogram materializes from the O(k) summary. */
case class KllHistogram(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.exact(prettyName, right.dataType, IntegerType)
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_histogram"

  @transient private lazy val cache = new SketchCache(KllSketch.deserialize)

  def histogram(sketchBytes: Array[Byte], nBins: Int): GenericArrayData = {
    // binning lives on KllSketch.histogram — one implementation shared
    // with ProfileJob; this wrapper only adapts to InternalRow
    val bins = cache.get(sketchBytes).histogram(nBins)
    new GenericArrayData(bins.map { case (lo, hi, cnt) =>
      InternalRow(lo, hi, cnt)
    }.toArray[Any])
  }

  override protected def nullSafeEval(sketch: Any, nBins: Any): Any =
    histogram(sketch.asInstanceOf[Array[Byte]], nBins.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kllHistExpr", this, classOf[KllHistogram].getName)
    nullSafeCodeGen(ctx, ev, (s, b) => s"${ev.value} = $ref.histogram($s, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllHistogram =
    copy(left = l, right = r)
}

/** `tdigest_quantile(sketchBytes, q)` — value at quantile q in [0,1]. */
case class TDigestQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val f = SketchTypeChecks.binaryFirst(prettyName, left.dataType)
    if (f.isFailure) f else SketchTypeChecks.numeric(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  @transient private lazy val cache = new SketchCache(TDigestSketch.deserialize)

  def quantile(sketchBytes: Array[Byte], q: Double): Double =
    cache.get(sketchBytes).quantile(q)

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    quantile(sketch.asInstanceOf[Array[Byte]], SketchTypeChecks.asDouble(q))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tdExpr", this, classOf[TDigestQuantile].getName)
    nullSafeCodeGen(ctx, ev, (s, q) =>
      s"${ev.value} = $ref.quantile($s, graft.spark.expr.SketchTypeChecks.asDouble($q));")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TDigestQuantile =
    copy(left = l, right = r)
}
