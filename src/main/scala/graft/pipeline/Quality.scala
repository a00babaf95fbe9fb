package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based document quality metrics — the "duplicated n-gram"
  * family of filters from the Gopher data-quality rules (Rae et al.
  * 2021, "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher", table A1: fraction of characters in the most
  * frequent n-gram / in duplicated n-grams): machine-generated and
  * template text repeats itself, and the repeat share separates it from
  * prose far more cheaply than any model-based scorer. Emitted per doc:
  *
  *   - `n_grams`     — total n-token shingles,
  *   - `n_distinct`  — distinct shingles,
  *   - `top_count`   — occurrences of the most frequent shingle,
  *   - `top_share`   — top_count / n_grams (the "most frequent n-gram"
  *                     rule's statistic),
  *   - `dup_frac`    — 1 − n_distinct / n_grams (the "duplicated
  *                     n-grams" rule's statistic).
  *
  * Scale shape: ZERO shuffles. Every statistic is a function of one
  * document alone, and each document is one row — so the whole operator
  * is a per-row fold: sort the doc's shingle array, then a single
  * `aggregate` (higher-order collection expression, no UDF) computes
  * run-lengths over the sorted array — distinct count and max
  * multiplicity in one O(g log g) pass per row. A groupBy-(doc, gram)
  * rendition would shuffle the corpus once for statistics that never
  * cross document boundaries; this stays inside the scan's
  * whole-stage-codegen pipeline and parallelizes per input split.
  *
  * Docs with no shingles (NULL or shorter than n tokens) are dropped —
  * the ratios are undefined there, and the downstream action is always
  * a threshold filter on docs that HAVE text.
  */
object Quality {

  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1: $n")
    val grams = array_sort(Decontam.shingles(col(textCol), n))
    // run-length fold over the sorted shingles: (prev, run, best, nd)
    val folded = aggregate(
      grams,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("nd")),
      (acc, x) => {
        val run = when(x <=> acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"),
          when(x <=> acc("prev"), acc("nd")).otherwise(acc("nd") + 1L)
            .as("nd"))
      })
    docs
      .select(col(idCol).as("doc_id"), size(grams).cast("long").as("n_grams"),
        folded.as("f"))
      .where(col("n_grams") > 0)
      .select(col("doc_id"), col("n_grams"),
        col("f.nd").as("n_distinct"), col("f.best").as("top_count"),
        round(col("f.best").cast("double") / col("n_grams"), 6)
          .as("top_share"),
        round(lit(1.0) - col("f.nd").cast("double") / col("n_grams"), 6)
          .as("dup_frac"))
  }
}
