package graft.spark.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.hash.HashKernels
import graft.sketch.{BloomSketch, CmsSketch, HeavyHittersSketch, HllSketch, KllSketch, TDigestSketch}

/** Sketch-building aggregate functions.
  *
  * Each is a `TypedImperativeAggregate` whose buffer IS the sketch object;
  * Catalyst's partial/final split calls `update` per row on the map side,
  * `serialize`/`deserialize` across the exchange, and `merge` on the
  * reduce side — exactly the reference's mergeable-state contract
  * (`BloomFilter.putAll`, `BloomFilter.java:198-207`) generalized. Because
  * every sketch's merge is associative and commutative (and idempotent
  * for Bloom/HLL), partial aggregation is partition-order independent.
  *
  * Output is the serialized sketch (BinaryType); pair with the scalar
  * expressions (`hll_estimate`, `bloom_might_contain`, ...) to query it.
  *
  * Value canonicalization: strings hash as UTF-8 bytes (reference String
  * overload semantics); binary as-is; integral types as 8-byte big-endian.
  */
private[spark] object ValueBytes {
  def checkSketchable(prettyName: String, dt: DataType): TypeCheckResult = dt match {
    case StringType | BinaryType | LongType | IntegerType | ShortType | ByteType |
        DateType | TimestampType | BooleanType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot sketch values of type ${other.catalogString}")
  }

  def checkNumeric(prettyName: String, dt: DataType): TypeCheckResult = dt match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric input, got ${other.catalogString}")
  }

  def toBytes(v: Any, dt: DataType): Array[Byte] = dt match {
    case StringType => v.asInstanceOf[UTF8String].getBytes
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case LongType | TimestampType => longBytes(v.asInstanceOf[Long])
    case IntegerType | DateType => longBytes(v.asInstanceOf[Int].toLong)
    case ShortType => longBytes(v.asInstanceOf[Short].toLong)
    case ByteType => longBytes(v.asInstanceOf[Byte].toLong)
    case BooleanType => longBytes(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case other => throw new IllegalStateException(s"unsupported sketch input type $other")
  }

  private def longBytes(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def toDouble(v: Any, dt: DataType): Double = dt match {
    case DoubleType => v.asInstanceOf[Double]
    case FloatType => v.asInstanceOf[Float].toDouble
    case LongType | TimestampType => v.asInstanceOf[Long].toDouble
    case IntegerType | DateType => v.asInstanceOf[Int].toDouble
    case ShortType => v.asInstanceOf[Short].toDouble
    case ByteType => v.asInstanceOf[Byte].toDouble
    case other => throw new IllegalStateException(s"unsupported KLL input type $other")
  }
}

/** `bloom_sketch(value, maxSize, bitsPerItem)` — reference-semantics Bloom. */
case class BloomAgg(
    child: Expression,
    maxSize: Long,
    bitsPerItem: Int,
    kernelName: String = "murmur2",
    longHash: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    ValueBytes.checkSketchable(prettyName, child.dataType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): BloomSketch =
    BloomSketch(maxSize, bitsPerItem, HashKernels(kernelName), longHash)

  override def update(buffer: BloomSketch, input: InternalRow): BloomSketch = {
    val v = child.eval(input)
    if (v != null) buffer.put(ValueBytes.toBytes(v, child.dataType))
    buffer
  }

  override def merge(buffer: BloomSketch, other: BloomSketch): BloomSketch =
    buffer.merge(other)

  override def eval(buffer: BloomSketch): Any = buffer.serialize()
  override def serialize(buffer: BloomSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BloomSketch = BloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c.head)
}

/** `hll_sketch(value, p)` — HyperLogLog registers. */
case class HllAgg(
    child: Expression,
    p: Int,
    kernelName: String = "murmur2",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    ValueBytes.checkSketchable(prettyName, child.dataType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): HllSketch =
    HllSketch(p, HashKernels(kernelName))

  override def update(buffer: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(ValueBytes.toBytes(v, child.dataType))
    buffer
  }

  override def merge(buffer: HllSketch, other: HllSketch): HllSketch = buffer.merge(other)
  override def eval(buffer: HllSketch): Any = buffer.serialize()
  override def serialize(buffer: HllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllSketch = HllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllAgg =
    copy(child = c.head)
}

/** `cms_sketch(value, depth, width)` — count-min counters. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    kernelName: String = "murmur2",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    ValueBytes.checkSketchable(prettyName, child.dataType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CmsSketch =
    CmsSketch(depth, width, HashKernels(kernelName))

  override def update(buffer: CmsSketch, input: InternalRow): CmsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(ValueBytes.toBytes(v, child.dataType))
    buffer
  }

  override def merge(buffer: CmsSketch, other: CmsSketch): CmsSketch = buffer.merge(other)
  override def eval(buffer: CmsSketch): Any = buffer.serialize()
  override def serialize(buffer: CmsSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsSketch = CmsSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(child = c.head)
}

/** `cms_sketch_weighted(key, weight, depth, width)` — count-min with
  * per-row additive weights (e.g. token counts per document): estimates
  * bound sum(weight) per key instead of row counts. Negative or null
  * weights are skipped (CMS requires the cash-register model — deletions
  * would break the one-sided error guarantee). */
case class CmsWeightedAgg(
    keyExpr: Expression,
    weightExpr: Expression,
    depth: Int,
    width: Int,
    kernelName: String = "murmur2",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsSketch] {

  override def children: Seq[Expression] = Seq(keyExpr, weightExpr)
  override def checkInputDataTypes(): TypeCheckResult = {
    val k = ValueBytes.checkSketchable(prettyName, keyExpr.dataType)
    if (k.isFailure) k
    else weightExpr.dataType match {
      case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral weight, got ${other.catalogString}")
    }
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch_weighted"

  override def createAggregationBuffer(): CmsSketch =
    CmsSketch(depth, width, HashKernels(kernelName))

  override def update(buffer: CmsSketch, input: InternalRow): CmsSketch = {
    val k = keyExpr.eval(input)
    val w = weightExpr.eval(input)
    if (k != null && w != null) {
      val weight = w match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => throw new IllegalStateException(s"unsupported weight $other")
      }
      if (weight > 0) buffer.update(ValueBytes.toBytes(k, keyExpr.dataType), weight)
    }
    buffer
  }

  override def merge(buffer: CmsSketch, other: CmsSketch): CmsSketch = buffer.merge(other)
  override def eval(buffer: CmsSketch): Any = buffer.serialize()
  override def serialize(buffer: CmsSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsSketch = CmsSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsWeightedAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsWeightedAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsWeightedAgg =
    copy(keyExpr = c(0), weightExpr = c(1))
}

/** `kll_sketch(value, k)` — KLL quantile compactors over numeric input. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    ValueBytes.checkNumeric(prettyName, child.dataType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllSketch = KllSketch(k)

  override def update(buffer: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = ValueBytes.toDouble(v, child.dataType)
      // NaN is skipped like null — one NaN would otherwise poison the
      // quantile structure (matches percentile-style user expectations)
      if (!java.lang.Double.isNaN(d)) buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllSketch, other: KllSketch): KllSketch = buffer.merge(other)
  override def eval(buffer: KllSketch): Any = buffer.serialize()
  override def serialize(buffer: KllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllAgg =
    copy(child = c.head)
}

/** `tdigest_sketch(value, compression)` — merging t-digest over numeric
  * input (Dunning & Ertl); strong tail-quantile accuracy. */
case class TDigestAgg(
    child: Expression,
    compression: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    ValueBytes.checkNumeric(prettyName, child.dataType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "tdigest_sketch"

  override def createAggregationBuffer(): TDigestSketch = TDigestSketch(compression)

  override def update(buffer: TDigestSketch, input: InternalRow): TDigestSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = ValueBytes.toDouble(v, child.dataType)
      if (!java.lang.Double.isNaN(d)) buffer.update(d) // NaN skipped like null
    }
    buffer
  }

  override def merge(buffer: TDigestSketch, other: TDigestSketch): TDigestSketch =
    buffer.merge(other)
  override def eval(buffer: TDigestSketch): Any = buffer.serialize()
  override def serialize(buffer: TDigestSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestSketch = TDigestSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TDigestAgg =
    copy(child = c.head)
}

/** `hh_sketch(value, capacity)` — SpaceSaving heavy hitters over strings.
  * With `weightExpr` set (hh_sketch_weighted), each row adds its integral
  * weight instead of 1 — e.g. heavy hitters by TOKEN volume, not document
  * count; non-positive and null weights are skipped. */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    weightExpr: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHittersSketch] {

  override def children: Seq[Expression] = child +: weightExpr.toSeq
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => weightExpr.map(_.dataType) match {
      case None | Some(LongType) | Some(IntegerType) | Some(ShortType) | Some(ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case Some(other) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral weight, got ${other.catalogString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (weightExpr.isDefined) "hh_sketch_weighted" else "hh_sketch"

  override def createAggregationBuffer(): HeavyHittersSketch =
    HeavyHittersSketch(capacity)

  override def update(buffer: HeavyHittersSketch, input: InternalRow): HeavyHittersSketch = {
    val v = child.eval(input)
    if (v != null) weightExpr match {
      case None => buffer.update(v.asInstanceOf[UTF8String].toString)
      case Some(we) =>
        val w = we.eval(input)
        if (w != null) {
          val weight = w match {
            case l: java.lang.Long => l.longValue()
            case n: java.lang.Number => n.longValue()
          }
          if (weight > 0) buffer.update(v.asInstanceOf[UTF8String].toString, weight)
        }
    }
    buffer
  }

  override def merge(buffer: HeavyHittersSketch, other: HeavyHittersSketch): HeavyHittersSketch =
    buffer.merge(other)
  override def eval(buffer: HeavyHittersSketch): Any = buffer.serialize()
  override def serialize(buffer: HeavyHittersSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HeavyHittersSketch =
    HeavyHittersSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHittersAgg =
    if (c.length == 2) copy(child = c(0), weightExpr = Some(c(1)))
    else copy(child = c(0), weightExpr = None)
}
