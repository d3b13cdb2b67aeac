package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth (quantile) binning — the feature-pipeline discretizer:
  * turn a numeric column into k buckets of (as near as possible) equal
  * ROW COUNT per group, so downstream consumers (target encoders,
  * monotonic-feature checks, histogram drift) see balanced cells
  * regardless of the value distribution's shape. Two faces:
  *
  *  - [[equiDepth]] — EXACT, ntile over a total order. ntile is
  *    row-count arithmetic on the rank (bucket sizes differ by at most
  *    one, lower buckets get the extra rows), so given the same total
  *    order both engines agree bit-for-bit — fully oracle-checkable.
  *    Cost: one hash exchange + per-group sort (the window); per-group
  *    state is the partition — group-bounded, same class as every
  *    rank-family op here.
  *  - [[equiDepthApprox]] — the 100 TB face: bucket BOUNDARIES from
  *    approx_percentile (mergeable KLL-style sketch, one aggregate, no
  *    per-group sort), assignment by scan-side binary search over the
  *    broadcast boundary array. Bucket populations are then
  *    approximate (sketch-accuracy sized), which is what every
  *    production discretizer accepts at corpus scale; the exact face
  *    is the audit twin (spec pins agreement within sketch tolerance).
  *
  * Ties: the exact face's total order must be made total by the caller
  * (pass a tiebreaker in `order`) or equal values straddling a bucket
  * edge land by rank, not by value — the approx face instead puts ALL
  * equal values in one bucket (boundary search is value-based). That
  * difference is inherent to equi-depth vs value-based cuts and is
  * documented rather than hidden.
  *
  * NULL values: the approx face emits a NULL bucket — an unbinnable
  * value must surface as such, not silently pollute bucket 1 (which is
  * what the raw boundary fold would do: NULL > b is never true). The
  * exact face can't skip rows inside ntile, so there NULLs land by the
  * caller's sort order (Spark sorts nulls FIRST ascending → bucket 1).
  * The faces therefore agree only on non-null values; callers binning a
  * nullable column should filter or route the NULL bucket explicitly.
  */
object Binning {

  /** Exact per-group equi-depth buckets 1..k by ntile over
    * (`order`...) — include a unique tiebreaker for a total order.
    * Adds `bucket` to the input columns. */
  def equiDepth(df: DataFrame, group: Column, order: Seq[Column],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.withColumn("bucket",
      ntile(k).over(Window.partitionBy(group).orderBy(order: _*)))
  }

  /** Sketch-boundary equi-depth: per-group approx_percentile boundaries
    * at i/k (i = 1..k−1), assignment = 1 + #boundaries strictly below
    * the value (all ties share a bucket; NULL values get a NULL
    * bucket — see the class scaladoc). `accuracy` is Spark's
    * approx_percentile accuracy knob (higher = tighter sketch). */
  def equiDepthApprox(df: DataFrame, group: Column, value: Column,
      k: Int, accuracy: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    if (k == 1)
      return df.withColumn("bucket", when(value.isNotNull, lit(1)))
    val probs = (1 until k).map(i => i.toDouble / k)
    val g = df.groupBy(group.as("_g"))
      .agg(percentile_approx(value, typedLit(probs), lit(accuracy)).as("_bounds"))
    // NULL-SAFE group match: a null group key is a legitimate ntile
    // partition in the exact face, so the boundary join must not drop
    // those rows (groupBy keeps the null group; plain === would never
    // rebind it)
    df.join(broadcast(g), group <=> col("_g"))
      .withColumn("bucket",
        when(value.isNotNull,
          (lit(1) + aggregate(col("_bounds"), lit(0),
            (acc, b) => acc + when(value > b, 1).otherwise(0))).cast("int")))
      .drop("_g", "_bounds")
  }
}
