package graft.spark.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k as a mergeable aggregate — the scale-safe replacement
  * for `row_number() OVER (PARTITION BY q) <= k`.
  *
  * A global window shuffles EVERY scored row into one reducer partition
  * per window key and sorts the world there; with few keys (ANN queries)
  * that is a handful of reducers sorting |corpus| x |queries| rows. This
  * aggregate instead keeps a k-element heap per group on the map side
  * (Catalyst's partial-aggregation split applies to any
  * TypedImperativeAggregate), so the exchange moves only k rows per
  * (group, map task) and the final merge is O(k log k) per group —
  * the same partial/merge contract as every sketch in this library.
  *
  * Ordering: score descending, value ascending on ties — deterministic,
  * matching `ORDER BY score DESC, value` window semantics exactly.
  * Output: array<struct<value, score>> sorted best-first; `posexplode`
  * yields (rank-1, entry).
  */
case class TopKByAgg(
    valueExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(valueExpr, scoreExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k < 1) return TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    valueExpr.dataType match {
      case LongType | IntegerType | StringType =>
        ValueBytes.checkNumeric(prettyName, scoreExpr.dataType)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports bigint/int/string values, got ${other.catalogString}")
    }
  }

  private def valueType: DataType = valueExpr.dataType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", valueType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val score = ValueBytes.toDouble(s, scoreExpr.dataType)
      // NaN scores are skipped like nulls (the KLL/t-digest policy): raw
      // double compares make NaN order-dependent, which would break the
      // partition-order-independence contract
      if (!java.lang.Double.isNaN(score) && buffer.scoreCompetitive(score)) {
        val v = valueExpr.eval(input)
        if (v != null) {
          // value materialized ONLY when the score can possibly admit:
          // an UnsafeRow's UTF8String aliases a reused buffer (must copy
          // before it outlives the row), and the copy/boxing per scored
          // row would otherwise dominate the brute-force ANN hot path
          val owned: AnyRef = valueType match {
            case StringType => v.asInstanceOf[UTF8String].toString
            case IntegerType => java.lang.Long.valueOf(v.asInstanceOf[Int].toLong)
            case LongType => java.lang.Long.valueOf(v.asInstanceOf[Long])
            case other => throw new IllegalStateException(s"unsupported value type $other")
          }
          buffer.offer(score, owned)
        }
      }
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = buffer.absorb(other)

  override def eval(buffer: TopKHeap): Any = {
    val rows = buffer.sorted.map { case (score, value) =>
      val v: Any = valueType match {
        case StringType => UTF8String.fromString(value.asInstanceOf[String])
        case IntegerType => value.asInstanceOf[java.lang.Long].intValue()
        case LongType => value.asInstanceOf[java.lang.Long].longValue()
        case other => throw new IllegalStateException(s"unsupported value type $other")
      }
      InternalRow(v, score)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val entries = buffer.sorted
    val isString = valueType == StringType
    val payload = entries.map { case (_, v) =>
      if (isString) graft.core.ByteOps.utf8(v.asInstanceOf[String]) else null
    }
    val size = 4 + 4 + entries.indices.map(i =>
      8 + (if (isString) 4 + payload(i).length else 8)).sum
    val buf = ByteBuffer.allocate(size)
    buf.putInt(buffer.k)
    buf.putInt(entries.length)
    entries.zipWithIndex.foreach { case ((score, v), i) =>
      buf.putDouble(score)
      if (isString) {
        val b = payload(i)
        buf.putInt(b.length)
        buf.put(b)
      } else buf.putLong(v.asInstanceOf[java.lang.Long].longValue())
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(buf.getInt())
    val n = buf.getInt()
    val isString = valueType == StringType
    var i = 0
    while (i < n) {
      val score = buf.getDouble()
      val v: AnyRef =
        if (isString) {
          val b = new Array[Byte](buf.getInt())
          buf.get(b)
          new String(b, "UTF-8")
        } else java.lang.Long.valueOf(buf.getLong())
      heap.offer(score, v)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByAgg =
    copy(valueExpr = c(0), scoreExpr = c(1))
}

/** Size-bounded top-k buffer: a binary min-heap whose root is the WORST
  * retained entry under (score desc, value asc), so admission is an O(1)
  * compare against the root and replacement is O(log k). Values are
  * java.lang.Long or String (materialized, never row-buffer aliases).
  */
final class TopKHeap(val k: Int) extends Serializable {
  private val scores = new Array[Double](k)
  private val values = new Array[AnyRef](k)
  private var n = 0

  def size: Int = n

  /** a strictly worse than b under (score desc, value asc)? */
  private def worse(sa: Double, va: AnyRef, sb: Double, vb: AnyRef): Boolean =
    if (sa != sb) sa < sb
    else cmpValue(va, vb) > 0

  private def cmpValue(a: AnyRef, b: AnyRef): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => throw new IllegalStateException("mixed top-k value types")
  }

  /** Can a row with this score possibly be admitted? (score strictly
    * above the root, equal to it — value tiebreak pending — or heap not
    * full.) O(1) pre-check so callers defer materializing the value. */
  def scoreCompetitive(score: Double): Boolean =
    n < k || score >= scores(0)

  def offer(score: Double, value: AnyRef): Unit = {
    if (n < k) {
      scores(n) = score
      values(n) = value
      n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), values(0), score, value)) {
      scores(0) = score
      values(0) = value
      siftDown(0)
    }
  }

  def absorb(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.n) {
      offer(other.scores(i), other.values(i))
      i += 1
    }
    this
  }

  /** Entries best-first: (score desc, value asc). */
  def sorted: Seq[(Double, AnyRef)] =
    (0 until n).map(i => (scores(i), values(i)))
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), values(i), scores(p), values(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && worse(scores(l), values(l), scores(m), values(m))) m = l
      if (r < n && worse(scores(r), values(r), scores(m), values(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val v = values(i); values(i) = values(j); values(j) = v
  }
}
