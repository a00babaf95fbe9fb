package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the mixture-building operator a
  * training-data pipeline runs last: "keep 30% of lang=en, 100% of
  * lang=de, 5% of everything else", reproducibly, with no RNG state.
  *
  * The decision rule is a pure function of (id, seed): a row is kept
  * iff the first 8 hex chars of `md5(id || ':' || seed)` compare below
  * the stratum's threshold, where the threshold is the 8-char
  * zero-padded hex of `floor(fraction * 16^8)`. Fixed-length lowercase
  * hex compares exactly like the number it encodes, so the rule is a
  * STRING comparison both engines implement bit-identically — no float
  * thresholds, no platform RNG, no numeric hex conversion to disagree
  * on (q65 oracles it row-for-row in DuckDB).
  *
  * Why it scales: the filter is scan-side map work (md5 of an 8-byte
  * id — whole-stage codegen, no UDF), the per-stratum thresholds join
  * in as a broadcast of |strata| rows, and there is NO shuffle at all:
  * sampling 100 TB is one pass that writes the survivors. Determinism
  * also means the sample is STABLE under retries, resumable writes,
  * and re-runs on moved partitions — the properties `TableIO`'s
  * resume story needs from its inputs. Changing the seed rotates the
  * kept set; fraction 0 drops the stratum ("00000000" — no key sorts
  * below it), 1.0 keeps all of it (sentinel "g": every hex char sorts
  * below 'g', so every key passes — a 9-char "100000000" would NOT
  * work, lexicographic order compares the first characters, not
  * lengths).
  *
  * Unknown strata (no entry in `fractions`) fall back to
  * `defaultFraction` (default 0 — drop unmapped strata loudly rather
  * than leak them into a curated mixture at full weight).
  */
object Sampling {

  private[graft] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"sampling fraction must be in [0, 1]: $fraction")
    if (fraction == 1.0) "g"
    else f"${math.floor(fraction * 4294967296.0).toLong}%08x"
  }

  def stratifiedHashSample(docs: DataFrame, idCol: String,
                           strataCol: String,
                           fractions: Map[String, Double], seed: Long,
                           defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.nonEmpty, "stratifiedHashSample needs >= 1 stratum")
    val spark = docs.sparkSession
    import spark.implicits._
    val thresholds = fractions.toSeq
      .map { case (s, f) => (s, thresholdHex(f)) }
      .toDF("_stratum", "_th")
    val defTh = thresholdHex(defaultFraction)
    docs
      .join(broadcast(thresholds),
        docs(strataCol) <=> col("_stratum"), "left")
      .where(substring(
          md5(concat(col(idCol).cast("string"), lit(":"), lit(seed.toString))),
          1, 8) < coalesce(col("_th"), lit(defTh)))
      .drop("_stratum", "_th")
  }
}
