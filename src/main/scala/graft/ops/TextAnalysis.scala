package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** DataFrame-level text analysis for training-data curation. Everything
  * here is either pure Spark built-ins (codegen'd, SQL-oracle-able) or
  * the deterministic expressions in TextExpressions.
  */
object TextAnalysis {

  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def minhash_sig(c: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    column(MinHashSig(expression(c), numHashes, shingleSize))
  def fingerprint64(c: Column): Column = column(Fingerprint64(expression(c)))
  def lang_id(c: Column): Column = column(LangId(expression(c)))
  def jaccard_shingles(a: Column, b: Column, shingleSize: Int = 3): Column =
    column(JaccardShingles(expression(a), expression(b), shingleSize))

  /** Whitespace token count — composed from built-ins so it pushes into
    * codegen and has an exact DuckDB oracle. */
  def token_count(c: Column): Column =
    F.when(F.length(F.trim(c)) === 0, F.lit(0))
      .otherwise(F.size(F.split(F.trim(c), "\\s+")))

  /** BPE-ish subword count: words contribute ceil(len/4) units,
    * punctuation one each — a cheap deterministic token-budget proxy. */
  def subword_count(c: Column): Column = {
    val words = F.split(F.trim(c), "\\s+")
    F.when(F.length(F.trim(c)) === 0, F.lit(0)).otherwise(
      F.aggregate(words, F.lit(0),
        (acc, w) => acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int")))
  }

  /** Per-document top-k terms by RARITY-WEIGHTED term frequency
    * (score = tf/df — the linear tf-idf variant; pure IEEE division of
    * integer counts, so a SQL oracle reproduces the ranking bit-for-bit,
    * where a log idf would hang the ordering on transcendental-function
    * parity between engines): the cheap keyword-extraction signal of a
    * curation pipeline. Two aggregations (term frequency per
    * doc, document frequency per term), one shuffle join on the term,
    * and the mergeable `top_k_by` k-heap per document — never a global
    * window over the whole term-doc matrix. Output: (idCol, rank, term),
    * ties broken by ascending term. */
  def topTermsByRarity(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import graft.spark.functions.top_k_by
    require(k >= 1, "k must be >= 1")
    val toks = df
      .select(F.col(idCol), F.explode(F.split(F.col(textCol), " ")).as("__term"))
      .filter(F.col("__term") =!= "")
    val tf = toks.groupBy(F.col(idCol), F.col("__term"))
      .agg(F.count(F.lit(1)).as("__tf"))
    // (doc, term) rows are distinct in tf, so df(term) = count(*)
    val dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).as("__df"))
    tf.join(dfreq, "__term")
      .select(F.col(idCol), F.col("__term"),
        (F.col("__tf").cast("double") / F.col("__df").cast("double")).as("__score"))
      .groupBy(F.col(idCol))
      .agg(top_k_by(F.col("__term"), F.col("__score"), k).as("__topk"))
      .select(F.col(idCol), F.posexplode(F.col("__topk")).as(Seq("__pos", "__e")))
      .select(F.col(idCol), (F.col("__pos") + 1).cast("long").as("rank"),
        F.col("__e.value").as("term"))
  }

  /** Quality features per document: the classic curation signals, all
    * exact arithmetic (SQL-expressible in both Spark and DuckDB). */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = F.col(textCol)
    val nChars = F.length(t)
    val nTokens = token_count(t)
    val punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    val digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    val alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    df.withColumn("n_chars_q", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        F.when(nTokens > 0, F.round(nChars.cast("double") / nTokens, 4)).otherwise(F.lit(0.0)))
      .withColumn("punct_ratio",
        F.when(nChars > 0, F.round(punct.cast("double") / nChars, 4)).otherwise(F.lit(0.0)))
      .withColumn("digit_ratio",
        F.when(nChars > 0, F.round(digits.cast("double") / nChars, 4)).otherwise(F.lit(0.0)))
      .withColumn("alpha_ratio",
        F.when(nChars > 0, F.round(alpha.cast("double") / nChars, 4)).otherwise(F.lit(0.0)))
  }

  /** Scalar quality score in [0,1]: penalizes extreme length, low alpha
    * share, digit/punct floods. Deterministic integer/4-dp arithmetic so
    * the DuckDB oracle reproduces it bit-for-bit. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val withF = withQualityFeatures(df, textCol)
    val lenOk = F.when(F.col("n_tokens").between(5, 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    val alphaOk = F.when(F.col("alpha_ratio") >= 0.6, F.lit(0.3)).otherwise(F.lit(0.0))
    val punctOk = F.when(F.col("punct_ratio") <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    val digitOk = F.when(F.col("digit_ratio") <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    withF.withColumn("quality_score", F.round(lenOk + alphaOk + punctOk + digitOk, 4))
  }
}
