package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Zero-extra-pass pipeline counters via `Dataset.observe` — the
  * monitoring idiom for 100 TB funnels: a quality gate or dedup stage
  * wants "rows in / rows kept / tokens dropped" numbers, but a separate
  * `count()` per stage re-scans the corpus once per metric. Observed
  * metrics ride the SAME action that materializes the frame (computed
  * executor-side as accumulator-backed aggregates), so a five-stage
  * funnel reports every stage's counters for the cost of the one pass
  * it was already paying.
  *
  * Contrast with [[Dedup.shingleDfTelemetry]] / q101-style telemetry
  * QUERIES: those are oracle-checkable result frames (a second,
  * deliberate aggregate); this is the in-flight form for production
  * runs where the answer frame is the product and the counters are a
  * side channel.
  *
  * Constraints inherited from `observe` (and pinned in TelemetrySpec):
  * metrics must be aggregates over the observed frame, and the value is
  * available only AFTER an action runs the plan. On streaming frames
  * use the query-progress listener instead; this helper targets batch.
  */
object Telemetry {

  /** Attach named aggregate metrics to a frame. Returns the frame to
    * keep composing with (observation is transparent to the plan — no
    * exchange, no barrier) plus the [[Observation]] handle whose
    * `.get` yields the metric row once any action has run. */
  def observed(df: DataFrame, name: String, first: Column, rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }

  /** The STREAMING face: `Observation` refuses streams (one metric row
    * per micro-batch, no single value to block on), so streaming
    * callers attach by name and read each batch's row from
    * `StreamingQueryProgress.observedMetrics(name)` (via
    * `query.recentProgress` or a StreamingQueryListener) — per-batch
    * counters for the cost of the pass the stream already pays. Works
    * on batch frames too (metrics then surface in QueryExecution
    * listeners rather than an Observation handle). */
  def observedStream(df: DataFrame, name: String, first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)
}
