package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** The reference's text-table ingestion (`cmd/mkhf.java:63-87`), as a
  * source: newline-delimited records; optional lowercase normalization
  * applied to the WHOLE line before splitting (`mkhf.java:69-71`); the
  * delimiter is a REGEX (Java `String.split`, default tab,
  * `mkhf.java:41`); and a record is kept only when it splits into
  * EXACTLY two fields — anything else is a silently-dropped "BAD line"
  * (`mkhf.java:75-80`).
  *
  * Faithfulness detail: Java `split(delim)` removes TRAILING empty
  * fields, so `"a\tb\t"` IS a valid 2-field record while Spark's
  * `split(col, delim, -1)` would call it 3 fields. The effective length
  * here subtracts the trailing-empty run before applying the
  * exactly-two rule, matching the reference byte for byte.
  *
  * Everything is Spark built-ins (codegen'd, no UDFs); at scale this is
  * a plain distributed text scan with a per-row projection.
  */
object TextKvSource {

  def read(spark: SparkSession, path: String,
      delim: String = "\t", lower: Boolean = false): DataFrame = {
    val raw = spark.read.text(path).select(F.col("value").as("line"))
    val normalized =
      if (lower) raw.select(F.lower(F.col("line")).as("line")) else raw
    val parts = F.split(F.col("line"), delim, -1)
    // Java String.split drops the trailing run of empty fields: effective
    // length = size - (trailing empties) = position of the last non-empty
    // field, counted from the front.
    val lastNonEmptyFromEnd =
      F.array_position(F.transform(F.reverse(parts), x => x =!= F.lit("")), true)
    val effLen = F.when(lastNonEmptyFromEnd === 0, F.lit(0))
      .otherwise(F.size(parts) - lastNonEmptyFromEnd + 1)
    normalized
      .select(parts.as("__p"), effLen.as("__n"))
      .filter(F.col("__n") === 2)
      .select(F.element_at(F.col("__p"), 1).as("key"),
        F.element_at(F.col("__p"), 2).as("value"))
  }
}
