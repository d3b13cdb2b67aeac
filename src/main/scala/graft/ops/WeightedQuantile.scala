package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WEIGHTED quantiles from a mergeable binned-CDF sketch — the 100 TB
  * face q212's exact weighted median promises ("weighted quantile
  * sketch, same plumbing as q142"): Spark's approx_percentile sketch
  * carries no weights, so the weighted case gets the repo's other
  * mergeable shape — the per-(group, bin) COUNTS state the drift
  * monitors run on ([[Drift.valueCounts]]), with the count being the
  * bin's total WEIGHT.
  *
  * Two passes, both cheap: (1) per-group (min, max) — a map-side
  * combined 2-scalar aggregate broadcast back; (2) scan-side fixed-
  * width bin assignment + per-(group, bin) weight sums — mergeable
  * integer state, ≤`bins` rows per group, maintained incrementally
  * under streaming exactly like the drift counts. The quantile is then
  * read off the tiny cumulative-weight frame: the first bin whose
  * cumulative weight crosses p of the total (integer crossing
  * arithmetic, the q212 rule lifted from rows to bins). No per-group
  * sort or row-level window anywhere — q212's exact face windows over
  * every ROW of the group; this face windows over ≤`bins` rows.
  *
  * Determinism: bin ids are floor((v − lo)·bins/(hi − lo)) — one
  * subtract, multiply, divide, floor, all IEEE correctly-rounded ops
  * on identical inputs, so both engines compute identical bins; the
  * crossing decision is pure integer comparison. Fully
  * hash-oracle-checkable, unlike a KLL sketch whose internals are
  * implementation-defined. Accuracy: the true weighted quantile lies
  * INSIDE the reported [bin_lo, bin_hi) band (width = range/bins) —
  * OpsSpec pins the q212 exact median inside the band.
  */
object WeightedQuantile {

  /** FROZEN-GRID face for incremental maintenance: per-(group, bin)
    * weight sums against caller-fixed global [lo, hi) bounds — with the
    * grid frozen the counts are purely mergeable (sum by (g, bin)), so
    * the state streams exactly like [[Drift.valueCounts]]
    * ([[graft.streaming.EventStreams.wquantileBatch]] is the
    * foreachBatch body; [[quantileFromCounts]] the read path). The
    * two-pass [[quantileBinned]] stays the batch face (data-fit grid);
    * freezing the grid is what a continuously-maintained quantile
    * monitor trades for mergeability — values outside [lo, hi) clamp
    * into the edge bins, surfaced by the edge-bin weights. */
  def binCounts(df: DataFrame, group: Column, value: Column,
      weight: Column, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, s"need hi > lo and bins >= 1: [$lo, $hi) x $bins")
    df.filter(value.isNotNull)
      .select(group.as("g"),
        least(lit(bins - 1), greatest(lit(0),
          floor((value.cast("double") - lit(lo)) * bins / lit(hi - lo))))
          .cast("int").as("bin"),
        weight.cast("long").as("w"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(col("w")).as("bw"))
  }

  /** Merge [[binCounts]] partials (batches, shards) into one state. */
  def mergeCounts(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("g"), col("bin"))
      .agg(sum(col("bw")).as("bw"))

  /** Read the `pBp` quantile band off a [[binCounts]] state — the same
    * integer crossing as [[quantileBinned]], over ≤`bins` rows/group
    * (totals via a second window spec on the one exchange, the same
    * single-consumption shape as the batch face). */
  def quantileFromCounts(counts: DataFrame, lo: Double, hi: Double,
      bins: Int, pBp: Int = 5000): DataFrame = {
    require(bins >= 1 && hi > lo, s"need hi > lo and bins >= 1: [$lo, $hi) x $bins")
    require(pBp > 0 && pBp < 10000, s"pBp must be in (0, 10000), got $pBp")
    val byG = Window.partitionBy(col("g"))
    counts
      .withColumn("cw", sum(col("bw")).over(byG.orderBy(col("bin"))))
      .withColumn("tw", sum(col("bw")).over(byG))
      .withColumn("n_bins_hit", count(lit(1)).over(byG))
      .filter(col("cw") * 10000 >= col("tw") * pBp &&
        (col("cw") - col("bw")) * 10000 < col("tw") * pBp)
      .select(col("g"), col("tw"), col("n_bins_hit"), col("bin"),
        (lit(lo) + col("bin") * lit(hi - lo) / bins).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(hi - lo) / bins).as("bin_hi"),
        col("bw").as("bin_w"))
  }

  /** Per-group weighted quantile band at probability `pBp` (basis
    * points: 5000 = median). `weight` must be a positive integral
    * column (long-castable); rows with a NULL value are the caller's
    * concern (filter or they bin by IEEE NULL semantics — dropped
    * here, surfaced in n_rows vs the caller's count). Output per
    * group: (g, tw, n_bins_hit, bin, bin_lo, bin_hi, bin_w) — bounds
    * UNROUNDED: they are single deterministic expressions over exact
    * min/max scalars (correctly-rounded IEEE ops on identical inputs
    * are bit-identical cross-engine), and the repo's rounding rule is
    * "round order-dependent aggregates, never deterministic
    * expressions" (HALF_UP vs HALF_EVEN must not decide a report). */
  def quantileBinned(df: DataFrame, group: Column, value: Column,
      weight: Column, bins: Int = 128, pBp: Int = 5000): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(pBp > 0 && pBp < 10000, s"pBp must be in (0, 10000), got $pBp")
    val rows = df.filter(value.isNotNull)
      .select(group.as("g"), value.cast("double").as("v"),
        weight.cast("long").as("w"))
    val bounds = rows.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val binned = rows.join(broadcast(bounds), "g")
      // degenerate single-value group -> everything in bin 0
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0)).otherwise(
          least(lit(bins - 1),
            floor((col("v") - col("lo")) * bins / (col("hi") - col("lo"))))
            .cast("int")))
    // bounds ride the counts aggregate (constant per group, `first` is
    // exact) and totals read off a second window SPEC on the SAME
    // partitioning — the whole read path after the bin aggregate is
    // one exchange over the <= bins-row frame. The naive tot-join
    // formulation re-derived the counts chain per consumer: FOUR fact
    // scans in the physical plan where the design needs exactly two
    // (bounds pass + bin pass) — caught in the q231 explain audit.
    val counts = binned.groupBy(col("g"), col("bin"))
      .agg(sum(col("w")).as("bw"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
    val byG = Window.partitionBy(col("g"))
    counts
      .withColumn("cw", sum(col("bw")).over(byG.orderBy(col("bin"))))
      .withColumn("tw", sum(col("bw")).over(byG))
      .withColumn("n_bins_hit", count(lit(1)).over(byG))
      .filter(col("cw") * 10000 >= col("tw") * pBp &&
        (col("cw") - col("bw")) * 10000 < col("tw") * pBp)
      .select(col("g"), col("tw"), col("n_bins_hit"), col("bin"),
        (col("lo") + col("bin") * (col("hi") - col("lo")) / bins).as("bin_lo"),
        (col("lo") + (col("bin") + 1) * (col("hi") - col("lo")) / bins).as("bin_hi"),
        col("bw").as("bin_w"))
  }
}
