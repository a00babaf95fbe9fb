package graft.pipeline

import graft.functions.SketchFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based operators — the "novel sketch" slot of the custom-op
  * inventory beside the as-of join (q27) and range join (q05).
  *
  * Published method: Count-Min Sketch (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1), 2005), via Spark's built-in
  * CountMinSketch aggregate (compose-existing-ops before custom code).
  */
object Sketches {

  /** Heavy-hitter keys: every key whose exact frequency is at least
    * `total / minShareDenom` of the input (e.g. denom 125 = keys holding
    * ≥ 0.8% of all rows — the hot-key detection a skew-salting pipeline
    * runs BEFORE choosing salt factors). Output: (keyCol, n) with n the
    * EXACT count.
    *
    * Scale shape (the reason this beats a straight groupBy-having at
    * 100 TB): pass 1 folds the full stream into a fixed-size sketch —
    * the CountMinSketch aggregate is merge-associative, so each
    * partition reduces to one sketch and only sketches cross the wire;
    * no per-partition full-vocabulary hash map is ever built (that map
    * is the OOM hazard when the key universe outgrows executor memory).
    * Pass 2 filters the DISTINCT key set (vocabulary-sized, not
    * stream-sized) by sketch estimate via the codegen `ner_cms_estimate`
    * lookup. Pass 3 exact-counts ONLY the surviving candidates — the
    * shuffle carries candidate-key rows, not the full stream's keys.
    *
    * Exactness: CMS error is ONE-SIDED (estimates only ever
    * overestimate), so no true heavy hitter can be pruned in pass 2 —
    * recall is 1.0 by construction, not by tuning. False candidates
    * admitted by over-estimation are removed by the exact count in
    * pass 3. The output therefore EQUALS the brute-force
    * groupBy-having answer deterministically — which is why q54 can be
    * oracled against plain SQL even though a sketch sits in the middle.
    * `eps`/`confidence` only trade sketch memory against candidate-set
    * size (wasted pass-3 work), never against correctness.
    *
    * NULL keys are EXCLUDED from the output (the sketch aggregate skips
    * them and a NULL never equals itself in the candidate join); the
    * denominator `total` still counts every row. A SQL mirror must
    * filter the NULL group (`WHERE key IS NOT NULL`) to match.
    *
    * Pass 1 is literally one job: the row count and the sketch come from
    * a single aggregate over the stream (two full scans would double the
    * dominant IO of the whole operator).
    */
  def heavyHitters(df: DataFrame, keyCol: String,
                   minShareDenom: Long = 125,
                   eps: Double = 1e-3, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(minShareDenom >= 1, s"minShareDenom must be >= 1: $minShareDenom")
    // Candidate-set bound, proven from parameters so the broadcast below
    // is safe by construction rather than by luck: a key passes pass 2
    // only if estimate >= total/denom, and CMS overestimates by at most
    // eps*total (with prob `confidence`), so its TRUE count must be
    // >= (1/denom - eps)*total. At most denom/(1 - eps*denom) keys can
    // each hold that share. Requiring eps*denom <= 0.5 caps candidates
    // at 2*denom keys w.h.p. — e.g. 250 rows for the defaults — far
    // under any broadcast budget. This is the fail-fast analogue of
    // Ann.MaxProbeBroadcastBytes, but free: it needs no counting job.
    // CAVEAT (union bound): `confidence` is PER-KEY, not corpus-wide —
    // with K distinct keys, ~(1-confidence)*K spurious keys can slip
    // past pass 2 in expectation, so the 2*denom cap holds w.h.p. only
    // while (1-confidence)*K << denom. At very high key cardinality
    // raise `confidence` toward 1 - denom/K (sketch depth grows only as
    // ln(1/(1-confidence)), so this is cheap); keys stay scalar either
    // way, so even the degraded case inflates pass-3 work rather than
    // breaking the broadcast outright.
    require(eps * minShareDenom <= 0.5,
      s"eps ($eps) * minShareDenom ($minShareDenom) = ${eps * minShareDenom}" +
        " > 0.5: the sketch is too coarse for this share threshold — the" +
        " candidate set is no longer provably broadcast-sized (bound is" +
        " denom/(1 - eps*denom)). Lower eps (finer sketch) or raise the" +
        " share threshold (smaller denom).")
    val first = df.agg(count(lit(1)).as("total"),
      expr(s"count_min_sketch(`$keyCol`, ${eps}d, ${confidence}d, $seed)")
        .as("cms")).head()
    val total = first.getLong(0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(first.getAs[Array[Byte]](1)))
    val candidates = df.select(keyCol).distinct()
      .where(SketchFunctions.ner_cms_estimate(col(keyCol), sketch) *
        minShareDenom >= lit(total))
    // Broadcast BY CONTRACT, not by estimator luck: `candidates` is a
    // distinct() filtered by an opaque codegen sketch lookup, whose
    // post-filter cardinality Catalyst cannot estimate — the static plan
    // would otherwise be a SortMergeJoin shuffling the FULL stream keyed
    // by the heavy-hitter (i.e. maximally skewed) keys, the exact
    // scale-killer this operator exists to avoid. The require above
    // proves the broadcast fits. Plan-gated in SketchSpec.
    df.join(broadcast(candidates), Seq(keyCol))
      .groupBy(keyCol).agg(count(lit(1)).as("n"))
      .where(col("n") * minShareDenom >= lit(total))
  }
}
