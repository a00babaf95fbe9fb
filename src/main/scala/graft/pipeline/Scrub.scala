package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass a training-data pipeline runs before
  * anything leaves curation: emails, IPv4 addresses, and phone-like
  * digit runs are replaced with fixed tokens, in that order (emails
  * first — they embed digits and dots; IPs before phones — a dotted
  * quad must become `<IP>`, not half a phone match).
  *
  * The patterns deliberately use only the regex subset whose semantics
  * agree between Java's engine (Spark codegen) and RE2 (DuckDB): no
  * backreferences, no lookaround, greedy quantifiers, `\b` word
  * boundaries — so the q66 oracle replays the identical rewrite. All
  * three rewrites are `regexp_replace` scan-side column expressions:
  * zero shuffles, whole-stage codegen, 100-TB shape is "one pass over
  * the text bytes".
  *
  * This is pattern-based PII scrubbing (the standard first line of
  * defense), NOT NER-based: names/addresses in prose need the model
  * pipeline ([[KgPipeline.detectMentions]]) — the two compose, regex
  * scrub first so the NER pass never sees raw identifiers.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d[\\d -]{7,}\\d"

  /** The redaction as a column expression (usable inside any select). */
  def redactCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Redact `textCol` in place, with a `had_pii` audit flag (curation
    * reports track how many documents were touched).
    */
  def redactPii(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("_clean", redactCol(col(textCol)))
      .withColumn("had_pii",
        when(col(textCol).isNull, lit(false))
          .otherwise(col("_clean") =!= col(textCol)))
      .withColumn(textCol, col("_clean"))
      .drop("_clean")
}
