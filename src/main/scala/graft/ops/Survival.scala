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
  * total. surv is 6dp-rounded at the reporting edge; verdicts
  * ([[medianSurvival]], logRank's significance) gate on the UNROUNDED
  * values (the q214 discipline).
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
  def kaplanMeierFromHist(hist: DataFrame): DataFrame =
    curve(hist.withColumn("grp", lit(0)))
      .drop("grp", "surv_raw")

  /** Per-group Kaplan-Meier — survival curves BY treatment arm /
    * cohort / segment (the canonical side-by-side read-out). Identical
    * arithmetic to [[kaplanMeier]] (it IS the same implementation,
    * partitioned), adding a leading `grp` column. */
  def kaplanMeierGrouped(df: DataFrame, group: Column, t: Column,
      event: Column): DataFrame =
    curve(df.select(group.as("grp"), t.cast("long").as("t"),
        event.as("event"))
      .groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("event"), 1L).otherwise(0L)).as("d")))
      .drop("surv_raw")

  /** ONE pipeline for both the grouped and ungrouped curve (the
    * ungrouped face passes a constant group): suffix window, factor
    * select, collect, and the prefix-product fold — including the
    * zero-event sequence(1, 0) guard — live exactly once. Emits both
    * the unrounded `surv_raw` (for verdicts) and the 6dp `surv`. */
  private def curve(hist: DataFrame): DataFrame = {
    val wSuf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val factors = hist.select(col("grp"), col("t"),
        sum(col("cnt")).over(wSuf).as("n_risk"),
        col("d"), (col("cnt") - col("d")).as("c"))
      .filter(col("d") > 0)
      .select(col("grp"), col("t"), col("n_risk"), col("d"), col("c"),
        ((col("n_risk") - col("d")).cast("double") /
          col("n_risk").cast("double")).as("factor"))
    factors
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(
        struct(col("t"), col("n_risk"), col("d"), col("c"),
          col("factor")))).as("ls"))
      // sequence(1, 0) DESCENDS in Spark rather than returning empty,
      // so a zero-event input must be cut BEFORE the index fan-out
      .filter(size(col("ls")) >= 1)
      .select(col("grp"), explode(expr(
        """transform(sequence(1, size(ls)), i -> struct(
             ls[i-1].t AS t, ls[i-1].n_risk AS n_risk,
             ls[i-1].d AS d, ls[i-1].c AS c,
             aggregate(slice(ls, 1, i), CAST(1.0 AS DOUBLE),
               (acc, x) -> acc * x.factor) AS surv))""")).as("r"))
      .select(col("grp"), col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"),
        col("r.surv").as("surv_raw"),
        round(col("r.surv"), 6).as("surv"))
  }

  /** Kaplan-Meier with Greenwood 95% confidence bands — the curve
    * plus the uncertainty that says whether a drop is signal or small-
    * risk-set noise: se(t) = S(t)·sqrt(Σ_{u≤t} d/(n(n−d))), bands
    * S ± z·se clamped to [0, 1]. The Greenwood sum is a SECOND
    * prefix fold over the SAME collected factor list (running product
    * and running sum share one struct accumulator — one list, two
    * recurrences, defined order). The d = n edge (every at-risk
    * subject events: S hits exactly 0, the variance term divides by
    * zero) emits NULL se/bands, not Inf. */
  def kaplanMeierCi(hist: DataFrame, zCrit: Double = 1.96): DataFrame = {
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
          col("n_risk").cast("double")).as("factor"),
        when(col("n_risk") - col("d") > 0,
          col("d").cast("double") /
            (col("n_risk").cast("double") *
              (col("n_risk") - col("d")).cast("double"))).as("gterm"))
    factors
      .agg(array_sort(collect_list(
        struct(col("t"), col("n_risk"), col("d"), col("c"),
          col("factor"), col("gterm")))).as("ls"))
      .filter(size(col("ls")) >= 1)
      .select(explode(expr(
        """transform(sequence(1, size(ls)), i -> struct(
             ls[i-1].t AS t, ls[i-1].n_risk AS n_risk,
             ls[i-1].d AS d, ls[i-1].c AS c,
             aggregate(slice(ls, 1, i), CAST(1.0 AS DOUBLE),
               (acc, x) -> acc * x.factor) AS surv,
             aggregate(slice(ls, 1, i), CAST(0.0 AS DOUBLE),
               (acc, x) -> acc + x.gterm) AS gsum))""")).as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"),
        round(col("r.surv"), 6).as("surv"),
        round(col("r.surv") * sqrt(col("r.gsum")), 6).as("se"),
        round(greatest(lit(0.0), col("r.surv") -
          lit(zCrit) * (col("r.surv") * sqrt(col("r.gsum")))), 6).as("lo95"),
        round(least(lit(1.0), col("r.surv") +
          lit(zCrit) * (col("r.surv") * sqrt(col("r.gsum")))), 6).as("hi95"))
  }

  /** Median survival time: the earliest event time where S(t) drops to
    * 0.5 or below (the standard KM read-out; None when the curve never
    * reaches 0.5 — more than half the subjects are censored). The
    * verdict compares the UNROUNDED survival — a curve sitting at
    * 0.50000004 has NOT reached its median even though it prints 0.5
    * at 6dp (round for reporting, never for verdicts). */
  def medianSurvival(df: DataFrame, t: Column, event: Column): Option[Long] =
    curve(histState(df, t, event).withColumn("grp", lit(0)))
      .filter(col("surv_raw") <= 0.5)
      .agg(min(col("t")))
      .head().getAs[Any](0) match {
        case null => None
        case v: Long => Some(v)
        case v: Number => Some(v.longValue())
      }

  /** Two-sample log-rank test — "are these two survival curves the
    * same curve?", the standard significance companion to a grouped
    * KM plot. At each event time of EITHER arm, arm 1's observed
    * events are compared to the hypergeometric expectation given the
    * pooled risk sets; the statistic is z = Σ(O−E) / sqrt(ΣV),
    * chi² = z². Determinism: risk sets and event counts are exact
    * longs; each E and V term is a short chain of IEEE ops on those
    * longs, and BOTH sums run as a defined-order fold over the ONE
    * collected t-ascending list (a distributed sum of the per-time
    * doubles would be accumulation-order exposed). `group` must be
    * 0/1-valued (arm 1 is the tested side). Output (one row): n1/n2 =
    * per-arm at-risk counts at the EARLIEST event time (the largest
    * risk sets), d1/d2 = total observed events per arm, z (6dp),
    * chi2 (6dp) — both NULL when no variance accrues — and
    * `different`: |z| > `zCrit` gated on the UNROUNDED statistic
    * (false when no variance). */
  def logRank(df: DataFrame, group: Column, t: Column,
      event: Column, zCrit: Double = 1.96): DataFrame = {
    val wSuf = org.apache.spark.sql.expressions.Window
      .orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val hist = df
      .select(group.cast("int").as("g"), t.cast("long").as("t"),
        event.as("event"))
      .groupBy(col("t"))
      .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("cnt1"),
        sum(when(col("g") =!= 1, 1L).otherwise(0L)).as("cnt2"),
        sum(when(col("g") === 1 && col("event"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("g") =!= 1 && col("event"), 1L).otherwise(0L)).as("d2"))
    val risk = hist.select(col("t"),
        sum(col("cnt1")).over(wSuf).as("n1"),
        sum(col("cnt2")).over(wSuf).as("n2"),
        col("d1"), col("d2"))
      .filter(col("d1") + col("d2") > 0)
    risk
      .agg(array_sort(collect_list(
        struct(col("t"), col("n1"), col("n2"), col("d1"), col("d2"))))
        .as("ls"))
      .select(expr("""aggregate(ls,
          named_struct('n1', 0L, 'n2', 0L, 'd1', 0L, 'd2', 0L,
            'oe', CAST(0.0 AS DOUBLE), 'v', CAST(0.0 AS DOUBLE)),
          (a, e) -> named_struct(
            'n1', greatest(a.n1, e.n1), 'n2', greatest(a.n2, e.n2),
            'd1', a.d1 + e.d1, 'd2', a.d2 + e.d2,
            'oe', a.oe + (CAST(e.d1 AS DOUBLE)
              - CAST((e.d1 + e.d2) * e.n1 AS DOUBLE)
                / CAST(e.n1 + e.n2 AS DOUBLE)),
            'v', a.v + CASE WHEN e.n1 + e.n2 > 1
              THEN CAST((e.d1 + e.d2) * e.n1 AS DOUBLE)
                / CAST(e.n1 + e.n2 AS DOUBLE)
                * (CAST(e.n2 AS DOUBLE) / CAST(e.n1 + e.n2 AS DOUBLE))
                * (CAST(e.n1 + e.n2 - (e.d1 + e.d2) AS DOUBLE)
                  / CAST(e.n1 + e.n2 - 1 AS DOUBLE))
              ELSE CAST(0.0 AS DOUBLE) END))
        """).as("s"))
      .select(col("s.n1").as("n1"), col("s.n2").as("n2"),
        col("s.d1").as("d1"), col("s.d2").as("d2"),
        when(col("s.v") > 0, round(col("s.oe") / sqrt(col("s.v")), 6))
          .as("z"),
        when(col("s.v") > 0,
          round(col("s.oe") * col("s.oe") / col("s.v"), 6)).as("chi2"),
        coalesce(when(col("s.v") > 0,
          abs(col("s.oe") / sqrt(col("s.v"))) > lit(zCrit)), lit(false))
          .as("different"))
  }
}
