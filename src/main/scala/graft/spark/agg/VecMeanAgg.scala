package graft.spark.agg

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a vector column — per-group embedding centroids
  * (cluster centers, per-label prototypes, per-source embedding drift)
  * as ONE mergeable aggregate.
  *
  * The naive formulation (`posexplode` the vectors, group by (key, dim),
  * average, re-assemble) shuffles |rows| x dims exploded rows and pays a
  * second aggregation to rebuild the array. This aggregate keeps a
  * (double[dims], count) buffer per group with map-side partial
  * aggregation — the exchange carries one buffer per (group, map task),
  * the same partial/merge contract as every sketch in this library, and
  * merge is element-wise addition (exactly associative up to FP addition
  * order, the standard distributed-mean caveat).
  *
  * Accumulation is in double regardless of input element width (float
  * inputs are widened per element). Null vectors and null rows are
  * skipped; a DIMENSION MISMATCH within one group fails the query loudly
  * — mixing dimensionalities in a centroid is data corruption, and the
  * truncate-or-pad alternatives silently bias the result (cf. the
  * cosine-similarity policy note in Similarity).
  *
  * Output: array<double> of length dims; null for an empty group.
  */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuf] {

  override def children: Seq[Expression] = Seq(child)

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_mean"

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf

  override def update(buffer: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buffer.ensure(n, prettyName)
      val isFloat = elemType == FloatType
      var i = 0
      while (i < n) {
        // a null ELEMENT inside a vector is malformed the same way a
        // wrong dimension is — fail loudly rather than skew one axis
        if (arr.isNullAt(i))
          throw new IllegalStateException(
            s"$prettyName: null element at dim $i (malformed vector)")
        buffer.sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buffer.count += 1
    }
    buffer
  }

  override def merge(buffer: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    if (other.count > 0) {
      buffer.ensure(other.sums.length, prettyName)
      var i = 0
      while (i < other.sums.length) { buffer.sums(i) += other.sums(i); i += 1 }
      buffer.count += other.count
    }
    buffer
  }

  override def eval(buffer: VecSumBuf): Any = {
    if (buffer.count == 0) null
    else {
      val out = new Array[Any](buffer.sums.length)
      var i = 0
      while (i < buffer.sums.length) { out(i) = buffer.sums(i) / buffer.count; i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buffer: VecSumBuf): Array[Byte] = {
    // dims = -1 encodes "no vector seen yet" (sums null); 0 is a REAL
    // state (a group of zero-length vectors) and must round-trip as an
    // allocated empty array, or merge() on the final side NPEs
    val dims = if (buffer.sums == null) -1 else buffer.sums.length
    val buf = ByteBuffer.allocate(4 + 8 + 8 * math.max(dims, 0))
    buf.putInt(dims)
    buf.putLong(buffer.count)
    var i = 0
    while (i < dims) { buf.putDouble(buffer.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val dims = buf.getInt()
    val b = new VecSumBuf
    if (dims >= 0) b.ensure(dims, prettyName)
    b.count = buf.getLong()
    var i = 0
    while (i < dims) { b.sums(i) = buf.getDouble(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecMeanAgg =
    copy(child = c(0))
}

/** (double sums, row count); dims bound by the first vector seen. */
final class VecSumBuf extends Serializable {
  var sums: Array[Double] = _
  var count: Long = 0L

  def ensure(dims: Int, name: String): Unit = {
    if (sums == null) sums = new Array[Double](dims)
    else if (sums.length != dims)
      throw new IllegalStateException(
        s"$name: dimension mismatch within group (${sums.length} vs $dims)")
  }
}
