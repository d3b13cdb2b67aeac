package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums — the two-level decomposition that replaces
  * the unpartitioned running-total window (which moves ALL rows to one
  * task — fine on a bounded frame, a scale-killer on an unbounded one).
  *
  * Level 1 partitions rows into contiguous key ranges (bucket =
  * floor(key/width)) and runs the running sum per bucket; level 2 runs
  * one tiny window over the per-bucket totals (rows/width entries) to
  * get each bucket's starting offset, broadcast back. The single-task
  * step thus touches `width` rows (level 1 partitions) or rows/width
  * rows (level 2) — never the whole frame. Same construction as
  * [[TextPipeline.pack]]'s corpus token offsets, factored out for any
  * ordered cumulative (CDF read-offs, offset assignment, rank spans).
  */
object Prefix {

  /** Inclusive running sum of `valueCol` in ascending `keyCol` order:
    * adds a `cum` column. Requires DISTINCT integer keys (each bucket
    * then holds at most `bucketWidth` rows); keys may be negative —
    * bucketing uses floor division so range contiguity is preserved
    * across zero. Aggregate the frame to one row per key first (any
    * running total over duplicate keys is order-ambiguous anyway). */
  def runningSum(df: DataFrame, keyCol: String, valueCol: String,
      bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0, s"bucket width must be positive, got $bucketWidth")
    // exact integer floor division ([[RangeJoin.floorDiv]] — the
    // pmod-shift + IntegralDivide form): floor semantics across zero so
    // range contiguity holds for negative keys, and exact at ANY long
    // magnitude — the previous floor(key / width.toDouble) mis-binned
    // keys past 2^52/width, the epoch-nanos domain this op's CDF and
    // offset callers actually live in
    val withB = df.withColumn("__pb", RangeJoin.floorDiv(col(keyCol), bucketWidth))
    val localWin = Window.partitionBy(col("__pb")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withB.withColumn("__lcum", sum(col(valueCol)).over(localWin))
    val bucketWin = Window.orderBy(col("__pb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy(col("__pb")).agg(sum(col(valueCol)).as("__bn"))
      .withColumn("__boff", coalesce(sum(col("__bn")).over(bucketWin), lit(0L)))
      .select(col("__pb"), col("__boff"))
    local.join(broadcast(offsets), "__pb")
      .withColumn("cum", col("__boff") + col("__lcum"))
      .drop("__pb", "__lcum")
  }
}
