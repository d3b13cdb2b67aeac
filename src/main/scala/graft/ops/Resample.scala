package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling with forward fill — the pandas
  * `resample().ffill()` operator Spark has no native form of: bucket an
  * event stream to a fixed step per key, materialize the COMPLETE grid
  * between each key's first and last bucket (absent buckets included),
  * and carry the last observed value across gaps.
  *
  * Scale shape: the bucket aggregate is one key+bucket shuffle with
  * map-side combine; the grid is generated from a |keys|-row span frame
  * (sequence + explode — grid size is time-span/step per key, bounded
  * by the calendar, not by event volume); the fill is one
  * unbounded-preceding `last(ignoreNulls)` window per key. The window
  * is inherently sequential per key, so parallelism is bounded by key
  * cardinality — with few, long keys the production layout splits the
  * key by coarse epoch chunks, fills within chunks, and carries the
  * per-chunk closing value across boundaries with a second |chunks|-row
  * pass; the per-key state either way is O(1) (the running last), never
  * history-sized.
  */
object Resample {

  /** Hourly resample of `sum(valueCol)` per `keyCol` with forward fill.
    * Emits (key, h, v_ff, is_gap): `v_ff` is the hour's sum or, for
    * hours with no events, the most recent earlier hour's sum; `is_gap`
    * marks the filled rows. The per-hour sum is rounded to 6dp BEFORE
    * the fill so filled values are bit-copies of an emitted hour. */
  def hourlyFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(round(sum(col(valueCol)), 6).as("v"))
    val grid = hourly
      .groupBy(col(keyCol))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    grid.join(hourly, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy(col(keyCol)).orderBy(col("h")))
          .as("v_ff"),
        col("v").isNull.as("is_gap"))
  }
}
