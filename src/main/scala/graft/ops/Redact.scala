package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Pattern redaction (PII scrubbing): replace every match of each
  * pattern with its placeholder and count what was removed — the
  * email/phone/ID scrub every public-corpus pipeline runs before
  * training.
  *
  * Pure projection, zero shuffle: regex evaluation is codegen'd
  * `regexp_replace` / `regexp_extract_all` over each row, so the op
  * scales linearly with the scan and pushes through any partitioning.
  * Patterns should stay inside the regex subset shared by engines
  * (character classes, quantifiers, alternation — no backrefs or
  * lookaround) so downstream SQL audits reproduce the exact counts.
  */
object Redact {

  /** One scrub rule: matches of `pattern` become `placeholder`, and
    * the output gains column `n_<name>` = match count in the ORIGINAL
    * text (counts are independent of rule order; replacements apply
    * sequentially in rule order). */
  final case class Rule(name: String, pattern: String, placeholder: String)

  /** Conservative defaults: emails and North-American-style phone
    * numbers. Both stay in the common regex subset. */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** Scrub `textCol` in place (output column `scrubbedCol`) and append
    * one `n_<rule>` count column per rule. All other columns pass
    * through. */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[Rule] = defaultRules,
      scrubbedCol: String = "scrubbed_text"): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    val scrubbed = rules.foldLeft(F.col(textCol)) { (c, r) =>
      F.regexp_replace(c, r.pattern, r.placeholder)
    }
    val counts = rules.map { r =>
      F.size(F.regexp_extract_all(F.col(textCol), F.lit(r.pattern), F.lit(0)))
        .cast("long").as(s"n_${r.name}")
    }
    val named = (scrubbedCol -> scrubbed) +:
      rules.map(r => s"n_${r.name}").zip(counts)
    named.foldLeft(df) { case (d, (name, col)) => d.withColumn(name, col) }
  }
}
