package graft.sources

import org.apache.spark.sql.{DataFrame, functions => F}

/** The reference's dump format as a sink (`cmd/dumphf.java:31-56`): one
  * `key<TAB>value` text line per record, no quoting and no escaping —
  * exactly what the reference prints, so a dump written here is parsed
  * back verbatim by [[TextKvSource]] (and by the reference's own `mkhf`).
  *
  * Like the reference, the format cannot represent keys or values that
  * contain the delimiter or a newline: such records would be dropped or
  * split by the exactly-two-fields rule on re-ingestion. Callers dumping
  * free text should pick an out-of-alphabet delimiter.
  *
  * At scale this is a plain distributed text write: one projection, no
  * shuffle, one output file per partition.
  */
object TextKvSink {

  def write(df: DataFrame, keyCol: String, valueCol: String, path: String,
      delim: String = "\t"): Unit = {
    df.select(F.concat_ws(delim,
        F.col(keyCol).cast("string"), F.col(valueCol).cast("string")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
