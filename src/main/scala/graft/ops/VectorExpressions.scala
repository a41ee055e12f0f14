package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
    // bits = 0 is the EXHAUSTIVE regime: the signature is constantly 0,
    // every vector lands in one bucket, and an LSH pipeline provably
    // degenerates to all-pairs / brute force — the oracle-checkable
    // configuration (see embedding_dups_exact / lsh_topk_exact)
    if (bits < 0 || bits > 63)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName bits must be in [0,63], got $bits")
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

/** `IvfCellsExpr(vec, centroids, nprobe)` — the IVF coarse quantizer:
  * the indices of the `nprobe` centroids with the largest dot product
  * against the (row-normalized) centroid matrix, ordered best-first with
  * index as the deterministic tie-break. With centroids L2-normalized at
  * construction, dot-product ranking equals cosine ranking.
  *
  * The centroid matrix is a plan constant (IVF "training" happens before
  * plan construction, see Similarity.ivfTopK) shipped once per task via
  * the serialized expression — nlist x dims doubles, kilobytes at any
  * sane nlist. Codegen'd through a reference object like
  * [[SrpSignatureExpr]], so assignment stays inside whole-stage codegen.
  */
case class IvfCellsExpr(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (centroids.isEmpty)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one centroid")
    if (nprobe < 1 || nprobe > centroids.length)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName nprobe must be in [1, ${centroids.length}], got $nprobe")
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_cells"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def cells(arr: ArrayData): ArrayData = {
    val dims = arr.numElements()
    val n = centroids.length
    // a quantizer must not silently truncate: a mis-assigned cell
    // poisons every downstream recall/rerank with no visible error
    // (the PqEncodeExpr rule), and an over-long vector would later
    // crash trainIvf's driver-side mean fill on an opaque index
    if (dims != centroids(0).length) {
      throw new IllegalArgumentException(
        s"ivf_cells: vector has $dims dims, centroids expect ${centroids(0).length}")
    }
    val dots = new Array[Double](n)
    var c = 0
    while (c < n) {
      val row = centroids(c)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        if (!arr.isNullAt(d)) {
          dot += row(d) * (if (isFloat) arr.getFloat(d) else arr.getDouble(d))
        }
        d += 1
      }
      // a single NaN element poisons every dot; map to -Inf so the vector
      // deterministically loses the ranking instead of crashing selection
      dots(c) = if (dot != dot) Double.NegativeInfinity else dot
      c += 1
    }
    // selection of the top nprobe by (dot desc, index asc): nprobe is
    // small, so an O(n * nprobe) partial selection beats a full sort
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](n)
    var s = 0
    while (s < nprobe) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i) && dots(i) > bestDot) { best = i; bestDot = dots(i) }
        i += 1
      }
      if (best == -1) {
        // every remaining dot is -Infinity (all-NaN input): degrade to
        // the first untaken cell rather than crash the query
        var j = 0
        while (taken(j)) j += 1
        best = j
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = cells(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfExpr", this, classOf[IvfCellsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.cells($c)")
  }

  override protected def withNewChildInternal(c: Expression): IvfCellsExpr =
    copy(child = c)
}

/** `cosine_similarity(a, b)` — exact cosine of two vector columns as a
  * native codegen'd expression: one tight loop over the columnar
  * ArrayData. This is the verify/rerank kernel of every similarity path
  * (brute-force, IVF, SRP-LSH, embedding dedup), and the higher-order-
  * function formulation it replaces (`zip_with` + `aggregate`) built a
  * per-row lambda interpreter ~20x slower on 128-dim floats.
  *
  * On well-formed inputs (equal-length, null-free element arrays — every
  * embedding this engine produces or reads) the arithmetic REPRODUCES
  * the higher-order form bit for bit, so oracle rank comparisons are
  * unaffected: per-element products in the input's own precision
  * (float·float stays a float multiply), accumulated left-to-right into
  * a double. On MALFORMED inputs the two deliberately diverge: the old
  * form returned null for a null element or a length mismatch (the null
  * product poisons the fold), silently dropping the row downstream; this
  * expression instead skips null elements, scores DIMENSION-MISMATCHED
  * pairs 0.0 outright (truncating would let a 1-element fragment score
  * ~1.0 against anything aligned with it), and returns 0.0 on a zero
  * norm — degraded vectors lose rankings rather than vanish without
  * trace.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    Seq(left.dataType, right.dataType).foreach {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case other => return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  @transient private lazy val leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return 0.0 // incomparable dimensions
    val n = na
    var dot = 0.0
    var d = 0
    while (d < n) {
      if (!a.isNullAt(d) && !b.isNullAt(d)) {
        if (leftFloat && rightFloat) {
          dot += a.getFloat(d) * b.getFloat(d) // float multiply, like zip_with
        } else {
          dot += (if (leftFloat) a.getFloat(d).toDouble else a.getDouble(d)) *
            (if (rightFloat) b.getFloat(d).toDouble else b.getDouble(d))
        }
      }
      d += 1
    }
    var sa = 0.0
    d = 0
    while (d < na) {
      if (!a.isNullAt(d)) {
        if (leftFloat) { val x = a.getFloat(d); sa += x * x }
        else { val x = a.getDouble(d); sa += x * x }
      }
      d += 1
    }
    var sb = 0.0
    d = 0
    while (d < nb) {
      if (!b.isNullAt(d)) {
        if (rightFloat) { val x = b.getFloat(d); sb += x * x }
        else { val x = b.getDouble(d); sb += x * x }
      }
      d += 1
    }
    val norm = math.sqrt(sa) * math.sqrt(sb)
    if (norm == 0.0) 0.0 else dot / norm
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosExpr", this, classOf[CosineSimExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.cosine($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimExpr = copy(left = l, right = r)
}

/** `srp_multiprobe(vec, bits, seed, nflip)` — multiprobe SRP bucket list
  * (Lv et al. VLDB'07 applied to sign-random-projection): the exact
  * signature first, then `nflip` one-bit perturbations flipping the
  * LEAST-CONFIDENT hyperplane sides (smallest |projection| — the bits a
  * true near neighbor most likely differs in). Probing these buckets
  * buys the recall of extra hash tables without building them: the
  * corpus is bucketed ONCE per table, only the (small, broadcast) query
  * side fans out.
  */
case class SrpMultiprobeExpr(child: Expression, bits: Int, seed: Long, nflip: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bits < 1 || bits > 63)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName bits must be in [1,63], got $bits")
    if (nflip < 0 || nflip > bits)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName nflip must be in [0,$bits], got $nflip")
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_multiprobe"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def probes(arr: ArrayData): ArrayData = {
    val dims = arr.numElements()
    val planes = SrpPlanes.get(seed, bits, dims)
    val dots = new Array[Double](bits)
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
      dots(b) = math.abs(dot)
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    val out = new Array[Long](1 + nflip)
    out(0) = sig
    // partial selection of the nflip smallest |dot| bits (ties by bit
    // index): nflip is small, O(bits * nflip) beats a sort
    val taken = new Array[Boolean](bits)
    var s = 0
    while (s < nflip) {
      var best = -1
      var bestAbs = Double.PositiveInfinity
      var i = 0
      while (i < bits) {
        if (!taken(i) && dots(i) < bestAbs) { best = i; bestAbs = dots(i) }
        i += 1
      }
      if (best == -1) { var j = 0; while (taken(j)) j += 1; best = j }
      taken(best) = true
      out(s + 1) = sig ^ (1L << best)
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = probes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mpExpr", this, classOf[SrpMultiprobeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probes($c)")
  }

  override protected def withNewChildInternal(c: Expression): SrpMultiprobeExpr =
    copy(child = c)
}

/** `PqEncodeExpr(vec, codebooks)` — the product-quantization encoder
  * (Jégou et al. 2011): the input vector is L2-NORMALIZED (so dot
  * ranking equals cosine ranking downstream), split into
  * m = codebooks.length equal blocks, and each block is replaced by the
  * index of its L2-nearest centroid in that block's codebook (ties
  * break on the lower index — deterministic). Output: array<int> of m
  * codes — the 100 TB story: a corpus row's similarity evidence
  * compresses from dims floats to m small ints, so the ANN exchange
  * and the resident index shrink by ~dims*4/m bytes per row.
  *
  * The codebook tensor is a plan constant (training happens before plan
  * construction, [[graft.ops.Similarity.trainPq]]) of m x kc x dsub
  * doubles — kilobytes at sane settings. Codegen'd through a reference
  * object like [[SrpSignatureExpr]]. A dimension mismatch fails loudly:
  * an encoder silently mis-slicing blocks would poison every downstream
  * score. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (codebooks.isEmpty || codebooks.exists(_.isEmpty))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs at least one centroid per block")
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def encode(arr: ArrayData): ArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val dims = arr.numElements()
    if (dims != m * dsub) {
      throw new IllegalArgumentException(
        s"pq_encode: vector has $dims dims, codebooks expect ${m * dsub} ($m blocks x $dsub)")
    }
    var normSq = 0.0
    var d = 0
    while (d < dims) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      normSq += x * x
      d += 1
    }
    val inv = if (normSq > 0.0) 1.0 / math.sqrt(normSq) else 0.0
    val out = new Array[Int](m)
    var b = 0
    while (b < m) {
      val book = codebooks(b)
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val x = (if (isFloat) arr.getFloat(b * dsub + j).toDouble
                   else arr.getDouble(b * dsub + j)) * inv
          val diff = x - cent(j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(b) = best
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncExpr", this, classOf[PqEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** `PqAdcScoreExpr(codes, query, codebooks)` — asymmetric distance
  * computation: the approximate cosine of an ENCODED corpus vector
  * against a RAW query, as the sum over blocks of
  * dot(centroid[b][code_b], normalizedQuerySub_b). The query is
  * normalized inside (once per evaluation; queries are broadcast and
  * few), the corpus side never decodes — m array lookups and m*dsub
  * multiply-adds per candidate, independent of whether the original
  * vectors were floats or doubles.
  *
  * Scoring-kernel degradation mirrors [[CosineSimExpr]]: a
  * dimension-mismatched query scores 0.0 rather than vanishing; a
  * corrupt code (out of codebook range) fails loudly. */
case class PqAdcScoreExpr(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    left.dataType match {
      case ArrayType(IntegerType, _) => ()
      case other => return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> codes, got ${other.catalogString}")
    }
    right.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> query, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_score"

  @transient private lazy val queryFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def score(codes: ArrayData, q: ArrayData): Double = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    // A codes column whose width disagrees with the codebook tensor means
    // the row was encoded against a different quantizer — corrupt pairing,
    // fail loudly (silently scoring 0.0 would degrade every shortlist to
    // arbitrary ties with no visible error). Only the documented
    // query-dimension case degrades to 0.0.
    if (codes.numElements() != m) {
      throw new IllegalArgumentException(
        s"pq_adc_score: codes length ${codes.numElements()} != codebook blocks $m")
    }
    if (q.numElements() != m * dsub) return 0.0
    var normSq = 0.0
    var d = 0
    val dims = m * dsub
    while (d < dims) {
      val x = if (queryFloat) q.getFloat(d).toDouble else q.getDouble(d)
      normSq += x * x
      d += 1
    }
    if (normSq == 0.0) return 0.0
    val inv = 1.0 / math.sqrt(normSq)
    var acc = 0.0
    var b = 0
    while (b < m) {
      // a null slot would read as code 0 and score silently — the exact
      // corrupt-codes case the class contract promises to fail on
      if (codes.isNullAt(b)) {
        throw new IllegalArgumentException(
          s"pq_adc_score: null code at block $b")
      }
      val code = codes.getInt(b)
      if (code < 0 || code >= codebooks(b).length) {
        throw new IllegalArgumentException(
          s"pq_adc_score: code $code out of range for block $b (kc=${codebooks(b).length})")
      }
      val cent = codebooks(b)(code)
      var j = 0
      while (j < dsub) {
        val x = (if (queryFloat) q.getFloat(b * dsub + j).toDouble
                 else q.getDouble(b * dsub + j)) * inv
        acc += cent(j) * x
        j += 1
      }
      b += 1
    }
    acc
  }

  override protected def nullSafeEval(c: Any, q: Any): Any =
    score(c.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcExpr", this, classOf[PqAdcScoreExpr].getName)
    defineCodeGen(ctx, ev, (c, q) => s"$ref.score($c, $q)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScoreExpr =
    copy(left = l, right = r)
}
