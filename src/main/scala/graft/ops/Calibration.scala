package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-calibration metrics — the missing third leg of the eval
  * family: q110 fits and scores, q216 ranks; nothing yet asked whether
  * the SCORES MEAN WHAT THEY SAY (a model predicting 0.9 should be
  * right ~90% of the time it says 0.9). Two standard instruments:
  *
  *  - [[reliability]] — the reliability table: `bins` equal-width
  *    probability bins, each reporting (n, n_pos, mean predicted p,
  *    observed positive rate). A calibrated model has mean_p ≈
  *    obs_rate per bin; the gap pattern (over/under-confidence) is the
  *    diagnostic a single scalar hides.
  *  - [[brier]] — the Brier score, mean (p − y)²: the proper scoring
  *    rule that decomposes into calibration + refinement; 0.25 is the
  *    chance floor for a balanced coin, lower is better.
  *
  * Scale shape: both are ONE map-side-combined aggregate over the
  * scored frame — bin assignment is scan-side integer arithmetic
  * (floor(p·bins), top edge clamped into the last bin), state is
  * `bins` rows / one row. Determinism: counts are exact longs;
  * obs_rate is a division of identical integers (correctly-rounded,
  * engine-exact); mean_p and brier are sums of doubles — accumulation-
  * order exposed, so they carry the repo's 6dp reporting round.
  */
object Calibration {

  /** Per-bin reliability over `prob` ∈ [0, 1] vs binary `label`
    * (0/1-castable). Output: (bin 0-based, n, n_pos, mean_p,
    * obs_rate), one row per NON-EMPTY bin. */
  def reliability(df: DataFrame, prob: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    df.select(
        // both edges clamped (the WeightedQuantile.binCounts guard): a
        // scorer emitting p = -1e-16 float noise must land in bin 0,
        // not a phantom bin -1 in the persisted monitoring state
        least(lit(bins - 1),
          greatest(lit(0), floor(prob.cast("double") * bins))).cast("int")
          .as("bin"),
        prob.cast("double").as("p"), label.cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        round(sum(col("p")) / count(lit(1)), 6).as("mean_p"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6).as("obs_rate"))
  }

  /** MERGEABLE per-bin state — the streaming face's sufficient
    * statistic: (bin, n, n_pos, sum_p, sum_sq) merge by plain sums, so
    * a continuously-scored stream maintains ONE tiny state table from
    * which the reliability table AND the Brier score are derived views
    * (the drift-trio pattern: one state, many monitors). sum_p/sum_sq
    * are double sums — order-exposed like any distributed sum, which
    * is why the derived views round at the reporting edge while the
    * integer columns stay exact. */
  def binState(df: DataFrame, prob: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    df.select(
        least(lit(bins - 1),
          greatest(lit(0), floor(prob.cast("double") * bins))).cast("int")
          .as("bin"),
        prob.cast("double").as("p"), label.cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p")).as("sum_p"),
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("sum_sq"))
  }

  /** Merge [[binState]] partials (micro-batches, shards). */
  def mergeState(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
        sum(col("sum_p")).as("sum_p"), sum(col("sum_sq")).as("sum_sq"))

  /** The [[reliability]] view of an accumulated [[binState]]. */
  def reliabilityFromState(state: DataFrame): DataFrame =
    state.select(col("bin"), col("n"), col("n_pos"),
      round(col("sum_p") / col("n"), 6).as("mean_p"),
      round(col("n_pos").cast("double") / col("n"), 6).as("obs_rate"))

  /** The [[brier]] view of an accumulated [[binState]] (one row). */
  def brierFromState(state: DataFrame): DataFrame =
    state.agg(sum(col("n")).as("n"),
      round(sum(col("sum_sq")) / sum(col("n")), 6).as("brier"))

  /** One-row Brier score: (n, brier = mean (p − y)², 6dp). */
  def brier(df: DataFrame, prob: Column, label: Column): DataFrame =
    df.select(prob.cast("double").as("p"), label.cast("double").as("y"))
      .agg(count(lit(1)).as("n"),
        round(avg((col("p") - col("y")) * (col("p") - col("y"))), 6).as("brier"))

  /** Isotonic (pool-adjacent-violators) calibration MAP over a
    * [[reliability]]-shaped table — the monotone fit that turns a
    * reliability diagnostic into a usable recalibration function
    * (Zadrozny & Elkan 2002). PAV is usually stated as a sequential
    * pooling loop; the closed MINIMAX form ĝ(i) = max_{j≤i} min_{k≥i}
    * A(j, k) (A = weighted mean of the observed rate over bins j..k)
    * makes it three joins over the BIN table instead — O(B³) pairs on
    * a frame of B ≤ dozens of rows, driver-free, and every A is a
    * single division of exact integer interval sums, so the whole fit
    * is bit-identical cross-engine and hash-oracle-checkable (a
    * sequential PAV loop would be neither). Input: (`binCol`, `nCol`,
    * `posCol`); output adds the raw obs_rate and the monotone
    * iso_rate — UNROUNDED (deterministic expressions; min/max of
    * identical doubles). The fit preserves total positive mass within
    * pooled blocks (Σ n·iso = Σ n_pos — pinned in spec). */
  def isotonic(rel: DataFrame, binCol: String = "bin", nCol: String = "n",
      posCol: String = "n_pos"): DataFrame = {
    // the bin frame has FIVE consumers below (j/k/m interval join, the
    // i-frame, the final rebind) — without a lineage cut Catalyst
    // re-derives rel's whole upstream chain per consumer (five corpus
    // scans in q238's physical plan, caught in the explain audit). The
    // frame is ≤bins rows — sketch-sized — so an eager localCheckpoint
    // is the pageRank/kCore discipline, not a cache leak: upstream runs
    // exactly once, everything below joins the materialized rows.
    val b = rel.select(col(binCol).as("bin"), col(nCol).cast("long").as("n"),
      col(posCol).cast("long").as("np"))
      .localCheckpoint(eager = true)
    val iv = b.select(col("bin").as("j"))
      .crossJoin(b.select(col("bin").as("k")))
      .filter(col("j") <= col("k"))
      .join(b.select(col("bin").as("mb"), col("n").as("mn"), col("np").as("mp")),
        col("mb") >= col("j") && col("mb") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("mn")).as("sn"), sum(col("mp")).as("sp"))
    val iso = b.select(col("bin").as("i"))
      .join(iv, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(min(col("sp").cast("double") / col("sn")).as("mn_a"))
      .groupBy(col("i"))
      .agg(max(col("mn_a")).as("iso_rate"))
    b.join(iso, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("np").as("n_pos"),
        (col("np").cast("double") / col("n")).as("obs_rate"),
        col("iso_rate"))
  }

  /** The precision/recall threshold-sweep (PR curve) view of an
    * accumulated [[binState]] — the deployment question ("what cutoff
    * do I ship?") answered from the SAME tiny state the reliability
    * table and Brier score read (one state, many monitors). Each
    * threshold t = k/bins is a SUFFIX SUM over the bin frame: p >=
    * k/bins ⇔ bin >= k exactly, because the bin edges ARE the
    * thresholds — so TP/FP/FN/TN are integer-exact with no second pass
    * over the scored data. F1 = 2TP/(2TP+FP+FN), one division of
    * exact integers, never composed from the already-rounded precision
    * and recall; zero-denominator edges emit NULL. The windows run
    * over exactly `bins` rows by construction (the q98 bounded-domain
    * convention): the state is DENSIFIED against the full bin domain
    * 0..bins-1 with zero counts first, so a threshold whose bin holds
    * no scored rows still emits its row (a consumer sweeping "all
    * thresholds" must not misread a silent gap) — suffix sums are
    * unchanged by zero-count rows. */
  def prCurveFromState(state: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val dense = state.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
      .join(state.select(col("bin"), col("n"), col("n_pos")), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"))
    dense
      .select(col("bin"),
        sum(col("n_pos")).over(w).as("tp"),
        (sum(col("n")).over(w) - sum(col("n_pos")).over(w)).as("fp"),
        (sum(col("n_pos")).over(tot) - sum(col("n_pos")).over(w)).as("fn"),
        (sum(col("n")).over(tot) - sum(col("n")).over(w) -
          (sum(col("n_pos")).over(tot) - sum(col("n_pos")).over(w))).as("tn"))
      .select((col("bin").cast("double") / bins).as("threshold"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0, round(col("tp").cast("double") /
          (col("tp") + col("fp")), 6)).as("precision"),
        when(col("tp") + col("fn") > 0, round(col("tp").cast("double") /
          (col("tp") + col("fn")), 6)).as("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          round(lit(2.0) * col("tp") /
            (lit(2) * col("tp") + col("fp") + col("fn")), 6)).as("f1"))
  }
}
