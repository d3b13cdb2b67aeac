package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed [start, end] rows — the gaps-and-islands
  * pattern (merge overlapping/touching intervals into maximal islands),
  * which is how a pipeline answers "how much wall-clock was this user
  * active?", "which IP ranges does this blocklist actually cover?",
  * "collapse these retry windows before billing them".
  *
  * Formulation: one per-key window pass. An interval starts a NEW
  * island iff its start lies strictly past the running maximum end of
  * every earlier interval (ordered by start); the island id is the
  * running count of such starts, and islands then reduce by plain
  * min/max/count aggregation. Touching intervals (start == previous
  * end) MERGE — [1,5] and [5,9] cover a contiguous span; pass
  * half-open intervals if touching must split.
  *
  * Scale shape: both window functions (the running max(end) and the
  * running sum of island starts) share ONE window spec — one shuffle on
  * the key, one per-partition sort, a single WindowExec; the aggregate
  * after it is map-side combinable on (key, island). Per-key state is
  * O(1) during the scan (running max + counter); the sort is bounded by
  * the busiest key's interval count — the same per-key bound every
  * sessionization already carries. Bounds must be a totally ordered
  * type; the fold is exact (no float arithmetic introduced).
  */
object Intervals {

  /** Maximal merged islands per key: (key, island_start, island_end,
    * n_intervals). Input rows with end < start are rejected nowhere —
    * they behave as their [start, start] point under the running max —
    * but upstream data that unordered is usually a bug; validate with
    * a Checks.Bounds suite if in doubt. */
  def merge(df: DataFrame, key: Column, start: Column, end: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(key.as("key"), start.as("s"), end.as("e"))
      .withColumn("new_island",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("island")
  }

  /** Per-key coverage rollup over [[merge]]: island count and total
    * covered span (sum of island lengths — numeric/long bounds). The
    * follow-on aggregate is |islands|-sized, map-side combined. */
  def coverage(df: DataFrame, key: Column, start: Column, end: Column): DataFrame =
    merge(df, key, start, end)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered"))
}
