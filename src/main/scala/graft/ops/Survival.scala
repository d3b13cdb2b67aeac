package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over right-censored durations —
  * the censoring-correct version of "median time to X": subjects that
  * leave observation before the event are removed from later risk sets
  * instead of being dropped (biases S(t) down) or treated as
  * evented-at-horizon (biases it up).
  *
  * Input: one row per subject with an integer duration `t` and a
  * boolean `event` (true = the event was OBSERVED at t; false =
  * censored at t). Output: one row per event time — (t, n_risk, d, c,
  * surv) where n_risk counts subjects with duration >= t, d the events
  * at t, c the censored leaving at t, and surv = Π_{u<=t} (1 − d_u /
  * n_u) over event times (standard KM: censoring times contribute no
  * factor, they only shrink later risk sets).
  *
  * Scale shape: one |subjects|-sized aggregate to the duration
  * histogram, a suffix-sum window over the histogram (bounded by the
  * DURATION DOMAIN, not the subject count — the q98 bounded-domain
  * convention; hours-to-horizon, days-of-history), then the product
  * fold over the ≤|domain| factor list. Determinism: each factor is
  * one division of exact longs; the cumulative product is a LEFT FOLD
  * over the t-ascending list (the q198/q201 sequential-recurrence
  * convention — Spark `aggregate()` and DuckDB `list_reduce` replay
  * the identical IEEE multiply sequence), O(|domain|²) multiplies
  * total. surv is 6dp-rounded at the reporting edge.
  */
object Survival {

  def kaplanMeier(df: DataFrame, t: Column, event: Column): DataFrame =
    kaplanMeierFromHist(histState(df, t, event))

  /** The MERGEABLE sufficient statistic: the duration histogram
    * (t, cnt, d) — plain-sum mergeable, so a stream of newly-resolved
    * subjects maintains ONE ≤|domain|-row state from which the whole
    * curve re-derives (the calibration/drift one-state pattern; all
    * columns integers, so stream == batch EXACTLY). */
  def histState(df: DataFrame, t: Column, event: Column): DataFrame =
    df.select(t.cast("long").as("t"), event.as("event"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("event"), 1L).otherwise(0L)).as("d"))

  /** Merge [[histState]] partials (micro-batches, shards). */
  def mergeHist(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("t"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("d")).as("d"))

  /** The survival-curve view of an accumulated [[histState]]. */
  def kaplanMeierFromHist(hist: DataFrame): DataFrame = {
    val wSuf = org.apache.spark.sql.expressions.Window
      .orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val factors = hist.select(col("t"),
        sum(col("cnt")).over(wSuf).as("n_risk"),
        col("d"), (col("cnt") - col("d")).as("c"))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        ((col("n_risk") - col("d")).cast("double") /
          col("n_risk").cast("double")).as("factor"))
    factors
      .agg(array_sort(collect_list(
        struct(col("t"), col("n_risk"), col("d"), col("c"),
          col("factor")))).as("ls"))
      // sequence(1, 0) DESCENDS in Spark rather than returning empty,
      // so a zero-event input must be cut BEFORE the index fan-out
      .filter(size(col("ls")) >= 1)
      .select(explode(expr(
        """transform(sequence(1, size(ls)), i -> struct(
             ls[i-1].t AS t, ls[i-1].n_risk AS n_risk,
             ls[i-1].d AS d, ls[i-1].c AS c,
             aggregate(slice(ls, 1, i), CAST(1.0 AS DOUBLE),
               (acc, x) -> acc * x.factor) AS surv))""")).as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"),
        round(col("r.surv"), 6).as("surv"))
  }

  /** Median survival time: the earliest event time where S(t) drops to
    * 0.5 or below (the standard KM read-out; None when the curve never
    * reaches 0.5 — more than half the subjects are censored). One
    * bounded-domain aggregate over the curve frame. */
  def medianSurvival(curve: DataFrame): Option[Long] =
    curve.filter(col("surv") <= 0.5)
      .agg(min(col("t")))
      .head().getAs[Any](0) match {
        case null => None
        case v: Long => Some(v)
        case v: Number => Some(v.longValue())
      }
}
