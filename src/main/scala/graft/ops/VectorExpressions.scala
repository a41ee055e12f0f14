package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `srp_signature(vec, bits, seed)` — signed-random-projection LSH
  * signature (Charikar 2002) as a native Catalyst expression: the signs
  * of `bits` random-hyperplane projections packed into a long. Collision
  * probability of two vectors at angle theta is (1 - theta/pi)^bits.
  *
  * This is the hot projection of every embedding-dedup / ANN-LSH
  * pipeline, so it must stay inside whole-stage codegen: `doGenCode`
  * emits a direct call against a codegen reference object reading the
  * columnar ArrayData in place — no UDF SerDe, no Seq materialization.
  * Hyperplanes are counter-mode murmur Gaussians (Similarity.gaussian),
  * regenerated deterministically per executor and cached per
  * (seed, bits, dims) — nothing is shipped with the plan.
  */
case class SrpSignatureExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bits < 1 || bits > 63)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName bits must be in [1,63], got $bits")
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_signature"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def signature(arr: ArrayData): Long = {
    val dims = arr.numElements()
    val planes = SrpPlanes.get(seed, bits, dims)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val row = planes(b)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        if (!arr.isNullAt(d)) {
          dot += row(d) * (if (isFloat) arr.getFloat(d) else arr.getDouble(d))
        }
        d += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(v: Any): Any = signature(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpExpr", this, classOf[SrpSignatureExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.signature($c)")
  }

  override protected def withNewChildInternal(c: Expression): SrpSignatureExpr =
    copy(child = c)
}
