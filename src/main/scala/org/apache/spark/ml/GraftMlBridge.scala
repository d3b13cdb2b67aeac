package org.apache.spark.ml

import org.apache.spark.ml.util.HasTrainingSummary

/** Minimal bridge into Spark ML's private[ml] surface (the sibling of
  * GraftSqlBridge): a fitted model's training summary pins the fitting
  * SparkSession — which does NOT serialize (ObservationManager) once the
  * model is captured in a scoring task closure — and `copy()` carries
  * the summary over, so the only clean detach point is the private[ml]
  * setter. Nothing else crosses the boundary. */
object GraftMlBridge {
  /** The same model with no training summary attached. */
  def stripSummary[M <: HasTrainingSummary[_]](m: M): M = m.setSummary(None)
}
