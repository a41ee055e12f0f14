package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.ByteOps
import graft.core.hash.Murmur2Kernel

/** Text-analysis primitives for training-data pipelines, built on the
  * engine's hash kernels. All are deterministic pure functions of the
  * input string, so results are reproducible across runs, partitionings
  * and cluster sizes.
  */
object TextOps {

  @inline def tokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** 64-bit SimHash over murmur-hashed tokens: per-bit majority vote of
    * token hashes (Charikar 2002). Near-duplicate texts land within a
    * small Hamming distance. */
  def simhash64(s: String): Long = {
    val toks = tokens(s)
    if (toks.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Murmur2Kernel.hash64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 64-bit SimHash over order-sensitive token n-grams — the production
    * near-dup signature. Unigram SimHash ([[simhash64]]) collapses on
    * natural-language corpora: Zipf's law means any two documents share
    * the high-frequency word TYPES ("the", "of", ...), and an
    * order-insensitive majority vote over shared types yields
    * near-identical signatures for unrelated documents (measured on a
    * Zipf corpus: 15% of ALL pairs landed within hamming 3 — a
    * quadratic output at scale). N-gram features are order-sensitive,
    * so documents sharing vocabulary but not phrasing decorrelate, while
    * lightly mutated near-copies still share most n-grams (Manku et al.
    * 2007 hash weighted features for the same reason). The n-gram hash
    * is minhashSignature's fmix chain over per-token murmur hashes —
    * string-free past tokenization. */
  def simhashNgram64(s: String, width: Int): Long = {
    val toks = tokens(s)
    val n = toks.length
    if (n == 0) return 0L
    val w = if (n < width) 1 else width
    val th = new Array[Long](n)
    var t = 0
    while (t < n) {
      th(t) = Murmur2Kernel.hash64(ByteOps.utf8(toks(t)))
      t += 1
    }
    val votes = new Array[Int](64)
    var start = 0
    val nShingles = n - w + 1
    while (start < nShingles) {
      var base = th(start)
      var j = 1
      while (j < w) {
        base = graft.sketch.HllSketch.fmix64(base ^ (th(start + j) * 0xc4ceb9fe1a85ec53L))
        j += 1
      }
      var b = 0
      while (b < 64) {
        if (((base >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      start += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** k-min-hash signature over token shingles (Broder 1997): element i is
    * the minimum over shingles of h_i(shingle), where the k hash
    * functions derive from ONE murmur64 evaluation per shingle:
    * h_i(x) = fmix64(murmur64(x) XOR c_i), c_i = (i+1)·golden-ratio-odd.
    * XOR with a distinct constant followed by a full avalanche yields an
    * (approximately min-wise independent) family — the standard
    * construction — at 1 strong hash per shingle instead of k. At k=64
    * that removes ~98% of the hash work from the dominant stage of the
    * LSH dedup pipeline (the per-document signature), which is what the
    * whole job spends its time on at corpus scale. (Earlier rounds used
    * the reference's seed-by-index scheme, murmur64(x, seed=i), at 64
    * full murmur runs per shingle; recall/precision tests are unchanged
    * — any well-mixed family passes them.)
    *
    * Hot path of the minhash-LSH dedup pipeline (one call per document).
    * The whole loop is string-free past tokenization: each token is
    * murmur-hashed ONCE, a shingle's identity is the order-sensitive
    * fmix64-chain of its token hashes (a 2^-64 identity collision merely
    * merges two shingles), and shingle dedup runs through a primitive
    * open-addressed long table — jstack sampling of the earlier
    * string-shingle version showed shingle-string/Set building
    * dominating the murmur work it fed. */
  def minhashSignature(s: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val toks = tokens(s)
    val n = toks.length
    if (n == 0) return sig
    val th = new Array[Long](n)
    var t = 0
    while (t < n) {
      th(t) = Murmur2Kernel.hash64(ByteOps.utf8(toks(t)))
      t += 1
    }
    val width = if (n < shingleSize) 1 else shingleSize
    val nShingles = n - width + 1
    // open-addressed dedup table (0 = empty; a zero hash is remapped)
    var cap = 4
    while (cap < nShingles * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var start = 0
    while (start < nShingles) {
      var base = th(start)
      var j = 1
      while (j < width) {
        base = graft.sketch.HllSketch.fmix64(base ^ (th(start + j) * 0xc4ceb9fe1a85ec53L))
        j += 1
      }
      if (base == 0L) base = 0x1b873593L
      // probe: insert if absent
      var slot = ((base ^ (base >>> 32)).toInt) & mask
      var state = 0 // 0 = probing, 1 = fresh, 2 = duplicate
      while (state == 0) {
        val cur = table(slot)
        if (cur == 0L) { table(slot) = base; state = 1 }
        else if (cur == base) state = 2
        else slot = (slot + 1) & mask
      }
      if (state == 1) {
        var i = 0
        while (i < numHashes) {
          val h = graft.sketch.HllSketch.fmix64(base ^ ((i + 1) * 0x9e3779b97f4a7c15L))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      start += 1
    }
    sig
  }

  /** Distinct `width`-token shingle IDENTITY HASHES of `s` (Decontaminate
    * tokenization: split on single space, drop empties), empty when the
    * document has fewer than `width` tokens. A shingle's identity is the
    * order-sensitive fmix64 chain of its per-token murmur hashes — the
    * SAME construction [[minhashSignature]] and [[simhashNgram64]] use —
    * so no shingle string is ever materialized: the prefix-filter dedup
    * pipeline (Dedup.ngramPrefixCandidates) does all its frequency
    * counting, rarity ordering and intersection arithmetic on 8-byte
    * longs instead of ~30-byte strings. A 2^-64 identity collision would
    * merge two shingles — the same documented tradeoff as
    * [[graft.ops.Dedup.exactDedup]] / duplicateSpans' hash-only grams.
    * Insertion-ordered distinct via an open-addressed long table (0 =
    * empty; a zero hash is remapped, as in [[minhashSignature]]).
    *
    * `tokenFallback = true` mirrors [[shingles]]' short-document rule:
    * a document with fewer than `width` tokens contributes its DISTINCT
    * TOKEN hashes (width-1 chains) instead of nothing — the regime
    * [[jaccardShingles]] (and therefore minhashLshPairs' verify)
    * defines. Token hashes and n-gram chain hashes live in the same
    * 64-bit space, so a cross-regime collision is possible at 2^-64 —
    * in string space the two vocabularies are disjoint (tokens cannot
    * contain the space an n-gram string always has); same accepted
    * tradeoff as every hash identity here. */
  def shingleHashes(s: String, width: Int, tokenFallback: Boolean = false): Array[Long] = {
    // Decontaminate.tokens semantics: split on the single space char,
    // drop empty segments (tabs/newlines stay inside tokens)
    val toks = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      val len = s.length
      while (i < len) {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        if (j > i) out += s.substring(i, j)
        i = j + 1
      }
      out
    }
    val n = toks.length
    if (n < width && !tokenFallback) return Array.emptyLongArray
    val th = new Array[Long](n)
    var t = 0
    while (t < n) {
      th(t) = Murmur2Kernel.hash64(ByteOps.utf8(toks(t)))
      t += 1
    }
    // short-doc fallback: width-1 "shingles" = the tokens themselves
    val w = if (n < width) 1 else width
    val nShingles = n - w + 1
    if (nShingles <= 0) return Array.emptyLongArray
    var cap = 4
    while (cap < nShingles * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    val out = new Array[Long](nShingles)
    var m = 0
    var start = 0
    while (start < nShingles) {
      var base = th(start)
      var j = 1
      while (j < w) {
        base = graft.sketch.HllSketch.fmix64(base ^ (th(start + j) * 0xc4ceb9fe1a85ec53L))
        j += 1
      }
      if (base == 0L) base = 0x1b873593L
      var slot = ((base ^ (base >>> 32)).toInt) & mask
      var state = 0
      while (state == 0) {
        val cur = table(slot)
        if (cur == 0L) { table(slot) = base; state = 1 }
        else if (cur == base) state = 2
        else slot = (slot + 1) & mask
      }
      if (state == 1) { out(m) = base; m += 1 }
      start += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** POSITIONAL `width`-token gram identity hashes: element p is the
    * chain hash of the gram starting at token position p (0-based), one
    * element per position, duplicates KEPT — the duplicateSpans shape,
    * where position identity matters and repeats are the signal. Same
    * tokenization and chain construction as [[shingleHashes]]; empty
    * array when the document has fewer than `width` tokens. */
  def gramHashes(s: String, width: Int): Array[Long] = {
    val toks = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      val len = s.length
      while (i < len) {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        if (j > i) out += s.substring(i, j)
        i = j + 1
      }
      out
    }
    val n = toks.length
    if (n < width) return Array.emptyLongArray
    val th = new Array[Long](n)
    var t = 0
    while (t < n) {
      th(t) = Murmur2Kernel.hash64(ByteOps.utf8(toks(t)))
      t += 1
    }
    val out = new Array[Long](n - width + 1)
    var start = 0
    while (start < out.length) {
      var base = th(start)
      var j = 1
      while (j < width) {
        base = graft.sketch.HllSketch.fmix64(base ^ (th(start + j) * 0xc4ceb9fe1a85ec53L))
        j += 1
      }
      out(start) = base
      start += 1
    }
    out
  }

  def shingles(s: String, size: Int): Set[String] = {
    val toks = tokens(s)
    if (toks.length < size) toks.toSet
    else toks.sliding(size).map(_.mkString(" ")).toSet
  }

  /** Exact Jaccard similarity of token shingle sets. */
  def jaccardShingles(a: String, b: String, size: Int): Double = {
    val sa = shingles(a, size)
    val sb = shingles(b, size)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  /** Rolling Karp-Rabin document fingerprint over normalized tokens:
    * order-sensitive (unlike minhash), so it distinguishes permutations;
    * stable under whitespace/case noise. */
  def fingerprint(s: String): Long = {
    val toks = tokens(s)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < toks.length) {
      h = h * 0x100000001b3L + Murmur2Kernel.hash64(
        toks(i).toLowerCase(java.util.Locale.ROOT))
      i += 1
    }
    h
  }

  // ---- language identification (trigram + stopword heuristic) ----

  // ORDERED: first profile wins score ties (the vote replaces only on
  // strictly-greater), so the order is part of the function's contract —
  // a Map here would tie-break by HashMap iteration order, opaque to the
  // SQL oracle that recomputes this vote (lang_id_exact)
  private val StopwordProfiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "of", "and", "to", "in", "is", "it", "that", "for", "was", "with", "are", "this", "you", "not"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "qui", "pas", "sur"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por", "con", "para", "no"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "eine", "zu", "den", "auf", "fur", "sich"),
    "it" -> Set("il", "la", "di", "e", "che", "un", "una", "per", "non", "sono", "con", "del", "le", "si", "da"))

  /** Heuristic language ID: CJK scripts by code point; otherwise the
    * stopword profile with the highest hit ratio; "und" when nothing
    * scores. Cheap, deterministic, and honest about being a heuristic —
    * a real pipeline would swap in a fastText-style model here. */
  def langId(s: String): String = {
    if (s.isEmpty) return "und"
    var cjk = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        val block = Character.UnicodeScript.of(c.toInt)
        if (block == Character.UnicodeScript.HAN) cjk += 1
        else if (block == Character.UnicodeScript.HIRAGANA ||
          block == Character.UnicodeScript.KATAKANA) return "ja"
        else if (block == Character.UnicodeScript.HANGUL) return "ko"
      }
      i += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.25) return "zh"
    // Locale.ROOT: the default-locale overload turns "IS" into "ıs"
    // under a Turkish JVM locale — results must not depend on the host
    val toks = tokens(s.toLowerCase(java.util.Locale.ROOT))
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestScore = 0.0
    StopwordProfiles.foreach { case (lang, words) =>
      val hits = toks.count(words.contains)
      val score = hits.toDouble / toks.length
      if (score > bestScore) { best = lang; bestScore = score }
    }
    if (bestScore >= 0.05) best else "und"
  }
}

private[ops] trait StringInOps { self: Expression =>
  protected final def checkStringIn(dt: DataType, pretty: String): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$pretty requires a string argument, got ${other.catalogString}")
  }
}

/** `simhash64(text)` */
case class SimHash64(child: Expression)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = checkStringIn(child.dataType, prettyName)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  def compute(s: UTF8String): Long = TextOps.simhash64(s.toString)
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** `simhash_ngram64(text, width)` — order-sensitive n-gram SimHash (the
  * production near-dup signature; see TextOps.simhashNgram64). */
case class SimHashNgram64(child: Expression, width: Int)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (width < 1) TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1")
    else checkStringIn(child.dataType, prettyName)
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_ngram64"
  def compute(s: UTF8String): Long = TextOps.simhashNgram64(s.toString, width)
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashNgramExpr", this, classOf[SimHashNgram64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): SimHashNgram64 = copy(child = c)
}

/** `minhash_sig(text, numHashes, shingleSize)` -> array<long>; the two
  * size arguments must be foldable ints. */
case class MinHashSig(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (numHashes < 1 || shingleSize < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName sizes must be >= 1")
    else checkStringIn(child.dataType, prettyName)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  def compute(s: UTF8String): GenericArrayData =
    new GenericArrayData(TextOps.minhashSignature(s.toString, numHashes, shingleSize))
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** `shingle_hashes(text, width)` -> array<long>: distinct order-sensitive
  * n-gram identity hashes (see TextOps.shingleHashes; `tokenFallback`
  * mirrors the jaccardShingles short-document token-set rule). */
case class ShingleHashes(child: Expression, width: Int,
    tokenFallback: Boolean = false)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (width < 1) TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1")
    else checkStringIn(child.dataType, prettyName)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  def compute(s: UTF8String): GenericArrayData =
    new GenericArrayData(TextOps.shingleHashes(s.toString, width, tokenFallback))
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashExpr", this, classOf[ShingleHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** `gram_hashes(text, width)` -> array<long>: positional n-gram identity
  * hashes, one per token position, duplicates kept (TextOps.gramHashes). */
case class GramHashes(child: Expression, width: Int)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (width < 1) TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1")
    else checkStringIn(child.dataType, prettyName)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_hashes"
  def compute(s: UTF8String): GenericArrayData =
    new GenericArrayData(TextOps.gramHashes(s.toString, width))
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashExpr", this, classOf[GramHashes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): GramHashes = copy(child = c)
}

/** `fingerprint64(text)` — rolling Karp-Rabin token fingerprint. */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = checkStringIn(child.dataType, prettyName)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"
  def compute(s: UTF8String): Long = TextOps.fingerprint(s.toString)
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fpExpr", this, classOf[Fingerprint64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
}

/** `lang_id(text)` — heuristic language code. */
case class LangId(child: Expression)
    extends UnaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = checkStringIn(child.dataType, prettyName)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(TextOps.langId(s.toString))
  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langExpr", this, classOf[LangId].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
}

/** `jaccard_shingles(a, b, size)` — exact token-shingle Jaccard. */
case class JaccardShingles(left: Expression, right: Expression, shingleSize: Int)
    extends BinaryExpression with StringInOps {
  override def checkInputDataTypes(): TypeCheckResult = {
    val f = checkStringIn(left.dataType, prettyName)
    if (f.isFailure) f else checkStringIn(right.dataType, prettyName)
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_shingles"
  def compute(a: UTF8String, b: UTF8String): Double =
    TextOps.jaccardShingles(a.toString, b.toString, shingleSize)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardExpr", this, classOf[JaccardShingles].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardShingles =
    copy(left = l, right = r)
}
