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
        least(lit(bins - 1), floor(prob.cast("double") * bins)).cast("int")
          .as("bin"),
        prob.cast("double").as("p"), label.cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        round(sum(col("p")) / count(lit(1)), 6).as("mean_p"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6).as("obs_rate"))
  }

  /** One-row Brier score: (n, brier = mean (p − y)², 6dp). */
  def brier(df: DataFrame, prob: Column, label: Column): DataFrame =
    df.select(prob.cast("double").as("p"), label.cast("double").as("y"))
      .agg(count(lit(1)).as("n"),
        round(avg((col("p") - col("y")) * (col("p") - col("y"))), 6).as("brier"))
}
