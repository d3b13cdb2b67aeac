package graft.pipelines

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import graft.ops.{Portable, TextPipeline}

/** Model-based quality filtering — the fastText/LR "quality classifier"
  * stage of an LLM data pipeline (train a cheap linear model on weak
  * labels, score the whole corpus, gate on the probability): here a
  * logistic regression distilling a strict form of the q31 heuristic
  * gate (n_tokens ≥ 40 AND stop_ratio ≤ 0.10 — q31's own thresholds
  * pass every fixture doc, which would leave the trainer a one-class
  * problem) into a smooth score over FOUR surface features, so the
  * scored corpus can be thresholded at any operating point instead of
  * the heuristic's hard edge.
  *
  * Scale shape: featurization is one scan-side projection (token-array
  * HOFs, no shuffle); LBFGS training aggregates gradients treeAggregate-
  * style over however many executors hold the corpus; scoring is again
  * scan-side (broadcast coefficients, one dot product per row). Nothing
  * here materializes per-doc state beyond the 4-float feature row, so
  * the pipeline is the same at 60k docs and 100 TB — the only 100 TB
  * change is sampling the TRAINING set (fit on a hash-gated slice, score
  * everything), which `fitSampleBp` exposes.
  */
object QualityClassifier {
  private val stopList = TextPipeline.QualityStopwords.map(w => s"'$w'").mkString(", ")

  /** (doc_id, n_tokens, avg_token_len, ttr, stop_ratio, label) — the
    * q30/q31 feature definitions verbatim, label = the q31 "ok" gate. */
  def featurize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(
        col("doc_id"),
        size(col("w")).cast("double").as("n_tokens"),
        (expr("aggregate(transform(w, t -> CAST(length(t) AS DOUBLE)), 0D, (a, x) -> a + x)")
          / size(col("w"))).as("avg_token_len"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("ttr"),
        (expr(s"size(filter(w, t -> t IN ($stopList)))").cast("double")
          / size(col("w"))).as("stop_ratio"))
      .withColumn("label",
        when(col("n_tokens") >= 40 && col("stop_ratio") <= 0.10, 1.0).otherwise(0.0))

  private val assembler = new VectorAssembler()
    .setInputCols(Array("n_tokens", "avg_token_len", "ttr", "stop_ratio"))
    .setOutputCol("features")

  /** Fit the distillation LR. `fitSampleBp` < 10000 trains on a
    * deterministic hash-gated sample (the 100 TB posture: fit on a
    * slice, score everything). */
  def fit(docs: DataFrame, fitSampleBp: Int = 10000): LogisticRegressionModel = {
    val feats = featurize(docs)
    val train =
      if (fitSampleBp >= 10000) feats
      else feats.filter(
        pmod(Portable.p60(col("doc_id").cast("string")), lit(10000)) < fitSampleBp)
    val m = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      .fit(assembler.transform(train))
    // drop the training summary: it pins the fitting SparkSession (whose
    // ObservationManager is not serializable), and a model captured in a
    // scoring task closure must serialize — copy() carries the summary
    // over, so detach it via the bridge
    org.apache.spark.ml.GraftMlBridge.stripSummary(m)
  }

  private val p1: UserDefinedFunction = udf((v: Vector) => v(1))

  /** Score every doc, keeping the ml probability vector (for AUC
    * evaluation): (doc_id, label, probability, prob, pred). Coefficients
    * ride the closure (a 4-float broadcast); scoring is scan-side. */
  def scoreWithRaw(docs: DataFrame, model: LogisticRegressionModel): DataFrame =
    model.transform(assembler.transform(featurize(docs)))
      .select(col("doc_id"), col("label"), col("probability"),
        p1(col("probability")).as("prob"),
        col("prediction").as("pred"))

  /** Score every doc: (doc_id, label, prob, pred). */
  def score(docs: DataFrame, model: LogisticRegressionModel): DataFrame =
    scoreWithRaw(docs, model).drop("probability")
}
