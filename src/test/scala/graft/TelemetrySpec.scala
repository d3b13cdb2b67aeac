package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Observed in-flight metrics: counters ride the materializing action
  * (no extra scan) and match the values a separate aggregate pass would
  * compute. */
class TelemetrySpec extends SparkSpec {

  test("observed funnel counters match a direct aggregate, one pass") {
    val docs = Tables(spark, sf, "documents")
    // a quality-gate stage: keep docs with >= 20 tokens; observe the
    // stage's in/kept/token counters on the SAME pass that writes
    val (gated, obs) = graft.ops.Telemetry.observed(
      docs.withColumn("n_toks", size(graft.ops.Portable.tokens(col("text")))),
      "quality_gate",
      count(lit(1)).as("rows_in"),
      sum(when(col("n_toks") >= 20, 1L).otherwise(0L)).as("rows_kept"),
      sum(col("n_toks")).as("tokens_in"))
    val kept = gated.filter(col("n_toks") >= 20)
    // ONE action: the noop write materializes the funnel and the metrics
    kept.write.format("noop").mode("overwrite").save()
    val row = obs.get
    val expectIn = docs.count()
    val expectKept = docs
      .filter(size(graft.ops.Portable.tokens(col("text"))) >= 20).count()
    assert(row("rows_in") == expectIn)
    assert(row("rows_kept") == expectKept)
    assert(row("tokens_in").asInstanceOf[Long] > 0L)
    // observation is plan-transparent: no exchange introduced
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
