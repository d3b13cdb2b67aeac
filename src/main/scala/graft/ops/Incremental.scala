package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the insert-only materialized-view
  * pattern (partial-state upkeep as in Spark's own partial/final
  * aggregate split, lifted to a PERSISTED table): keep one per-key row
  * of mergeable state (count / sum / min / max), fold each new batch in
  * by aggregating ONLY the batch and merging states, and derive the
  * final answers (mean included) from the state at read time.
  *
  * Scale shape: history is never rescanned — the standing cost per
  * refresh is a batch-sized scan plus a |keys|-sized merge shuffle,
  * where the naive refresh rescans the full 100 TB fact table. The
  * state table is key-cardinality-sized (the thing you'd store as a
  * bucketed parquet table keyed on `key`, making the merge a co-located
  * join at production scale).
  *
  * Contract: insert-only. count/sum admit retractions (negative
  * weights), but min/max are NOT mergeable under deletion — supporting
  * deletes means either dropping min/max from the state or rebuilding
  * affected keys, so this API stays append-only and says so rather than
  * quietly producing wrong bounds.
  */
object Incremental {

  /** Aggregate one batch (or the historical base, once) into per-key
    * mergeable state. `cnt` counts non-null `value`s so the derived
    * mean stays consistent with SQL `avg`. */
  def partial(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(
        count(value).as("cnt"),
        sum(value).as("sum"),
        min(value).as("vmin"),
        max(value).as("vmax"))

  /** Merge partial-state frames into one equivalent state: the fold is
    * associative and commutative, so any batch arrival order yields the
    * same state (float-addition reordering aside — consumers round, the
    * repo-wide convention). */
  def merge(partials: Seq[DataFrame]): DataFrame = {
    require(partials.nonEmpty, "merge needs at least one partial frame")
    partials.reduce(_.unionByName(_))
      .groupBy(col("key"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))
  }

  /** Derive the read-time aggregates from state. Keys whose values were
    * all null (cnt = 0) yield null mean, matching SQL avg over an empty
    * value set. */
  def finish(state: DataFrame): DataFrame =
    state.select(
      col("key"), col("cnt"), col("sum"), col("vmin"), col("vmax"),
      when(col("cnt") > 0, col("sum") / col("cnt")).as("mean"))
}
