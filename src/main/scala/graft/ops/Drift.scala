package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution-drift statistics — the nonparametric
  * companion to the PSI monitor (q115): PSI needs a binning choice;
  * the Kolmogorov–Smirnov statistic is binning-free (sup-norm distance
  * between the two empirical CDFs) and is the standard "did this
  * column's distribution move between snapshot A and snapshot B?" gate
  * for re-embeds, re-crawls and loader changes.
  *
  * Exactness: KS is computed in INTEGER arithmetic until one final
  * division — at each observed value the numerator |cumA·nB − cumB·nA|
  * is exact in longs, its per-group max is exact, and only the single
  * max is divided by nA·nB (then 6dp-rounded). No per-row float CDF
  * accumulation, so the statistic is bit-stable across engines and
  * partitionings.
  *
  * Scale shape: one (group, value) pre-aggregation (map-side combined —
  * this collapses duplicate values BEFORE any window), then a per-group
  * window ordered by value over the DISTINCT values only, then a
  * |groups|-sized aggregate. The window partition is bounded by the
  * distinct-value count per group — exact KS is for discrete or binned
  * columns (token counts, scores×10⁴, bucket ids); for an unbounded
  * continuous column, quantize first (the [[TextPipeline]] bucketing or
  * a fixed grid) and accept the binned statistic, which is what every
  * production drift monitor does at 100 TB anyway.
  */
object Drift {

  /** Per-group exact two-sample KS over `value`, samples split by the
    * boolean `inB` (false → sample A, true → sample B). Output: (group,
    * na, nb, ks 6dp); groups where either sample is empty are dropped
    * (KS undefined — surface them with a Checks.Complete gate, not a
    * null that poisons a comparison). */
  def ksStatistic(df: DataFrame, group: Column, value: Column,
      inB: Column): DataFrame = {
    val t = df.select(group.as("g"), value.as("x"),
      when(inB, 1L).otherwise(0L).as("b"))
    ksFromPer(t.groupBy(col("g"), col("x"))
      .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb")))
  }

  /** The sufficient statistic the monitor faces maintain: per-(group,
    * value) row counts — (g, x, c). Counts are MERGEABLE (plain sums),
    * so any batch/snapshot split folds with [[mergeCounts]] and the KS
    * over the merged counts equals the KS over the raw union — the
    * property that makes the streaming face exact, not approximate. */
  def valueCounts(df: DataFrame, group: Column, value: Column): DataFrame =
    df.groupBy(group.as("g"), value.as("x")).agg(count(lit(1)).as("c"))

  /** Fold [[valueCounts]] frames into one equivalent counts frame —
    * associative and commutative (integer sums, no float anywhere). */
  def mergeCounts(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeCounts needs at least one counts frame")
    parts.reduce(_.unionByName(_))
      .groupBy(col("g"), col("x")).agg(sum(col("c")).as("c"))
  }

  /** Exact KS from two [[valueCounts]] frames — sample A (the frozen
    * baseline) vs sample B (the accumulating current window). Identical
    * integer arithmetic and output shape to [[ksStatistic]]; the
    * full-outer join aligns value grids that only one side observed. */
  def ksFromCounts(countsA: DataFrame, countsB: DataFrame): DataFrame =
    ksFromPer(alignCounts(countsA, countsB))

  /** The shared count-grid alignment every *FromCounts view runs:
    * full-outer on (g, x) with absent cells coalesced to 0. */
  private def alignCounts(countsA: DataFrame, countsB: DataFrame): DataFrame =
    countsA.select(col("g"), col("x"), col("c").as("ca"))
      .join(countsB.select(col("g"), col("x"), col("c").as("cb")),
        Seq("g", "x"), "full_outer")
      .select(col("g"), col("x"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))

  /** Per-group exact two-sample Wasserstein-1 (earth-mover) distance —
    * the L1 companion to [[ksStatistic]]'s sup-norm: W1 = Σᵢ |F_A(xᵢ) −
    * F_B(xᵢ)|·(xᵢ₊₁ − xᵢ) over the merged sorted value grid. KS fires
    * on the single worst CDF gap (sensitive to localized shifts and
    * blind to how far mass moved); W1 integrates total displacement —
    * a small uniform shift of every value moves W1 linearly while KS
    * barely reacts — so a monitor wants both faces of the same counts.
    * Same integer-exact shape as KS: Σ |cumA·nB − cumB·nA|·gap is
    * exact in longs, ONE final division by nA·nB, 6dp. Same
    * discrete/binned contract, with the additional numerator bound
    * nA·nB·range(x) — keep n²·range under 2⁶³ (a binned column is). */
  def w1Statistic(df: DataFrame, group: Column, value: Column,
      inB: Column): DataFrame = {
    val t = df.select(group.as("g"), value.as("x"),
      when(inB, 1L).otherwise(0L).as("b"))
    w1FromPer(t.groupBy(col("g"), col("x"))
      .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb")))
  }

  /** Exact W1 from two [[valueCounts]] frames — the drift-monitor read
    * path shares ONE count-state table with [[ksFromCounts]]; both
    * statistics are derived views of the same sufficient statistic. */
  def w1FromCounts(countsA: DataFrame, countsB: DataFrame): DataFrame =
    w1FromPer(alignCounts(countsA, countsB))

  private def w1FromPer(per: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("x"))
    val cum = per
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      // grid step to the NEXT distinct value; the last value carries no
      // step (F_A = F_B = 1 beyond it — zero contribution by definition)
      .withColumn("gap", lead(col("x"), 1).over(w) - col("x"))
    val tot = per.groupBy(col("g"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.join(tot, "g")
      .filter(col("na") > 0 && col("nb") > 0)
      .groupBy(col("g"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        sum(when(col("gap").isNotNull,
          abs(col("cuma") * col("nb") - col("cumb") * col("na")) * col("gap"))
          .otherwise(lit(0L))).as("num"))
      .select(col("g"), col("na"), col("nb"),
        round(col("num").cast("double") / (col("na") * col("nb")), 6).as("w1"))
  }

  /** Per-group two-sample chi-squared homogeneity statistic — the
    * THIRD derived view of the same count state: KS reads the worst
    * CDF gap, W1 the total mass displacement, χ² the per-BIN rate
    * mismatch with thin bins weighted up. Its home turf is CATEGORICAL
    * columns (source, lang, format), where KS/W1 presuppose a value
    * ordering that is meaningless; nothing here orders by x. Two-sample
    * identity: χ² = Σ_bins (ca·nb − cb·na)² / (na·nb·(ca+cb)),
    * dof = bins − 1. Determinism: the per-bin difference ca·nb − cb·na
    * is exact in longs and its square exact in double while
    * |ca·nb − cb·na| < 2²⁶·⁵ (per-group sample sizes ≲ 10⁷ — bin or
    * sample first beyond that); the denominator is an exact long; only
    * the final per-group sum reassociates (~1e−16·bins relative),
    * absorbed by the 6dp round. */
  def chi2Statistic(df: DataFrame, group: Column, value: Column,
      inB: Column): DataFrame = {
    val t = df.select(group.as("g"), value.as("x"),
      when(inB, 1L).otherwise(0L).as("b"))
    chi2FromPer(t.groupBy(col("g"), col("x"))
      .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb")))
  }

  /** Exact χ² from two [[valueCounts]] frames — same shared-state read
    * path as [[ksFromCounts]]/[[w1FromCounts]]. */
  def chi2FromCounts(countsA: DataFrame, countsB: DataFrame): DataFrame =
    chi2FromPer(alignCounts(countsA, countsB))

  /** Per-group Shannon entropy (nats) and evenness of ONE sample's
    * value distribution — the single-sample PROFILING face over the
    * same [[valueCounts]] sufficient statistic the two-sample monitors
    * read: near-zero evenness exposes a constant/degenerate column,
    * near-one an id-like one, and tracking evenness over snapshots is
    * the cheapest "did this column's diversity collapse" tripwire.
    * H = ln n − (Σ c·ln c)/n; evenness = H / ln bins (null for a
    * single-bin group — no diversity to measure). The Σ c·ln c form
    * keeps every log argument an exact INTEGER-valued double (no
    * per-bin division before the log), so both engines feed libm
    * identical inputs and the only cross-engine exposure is 1-ulp
    * log/summation jitter under the 6dp round. */
  def entropyFromCounts(counts: DataFrame): DataFrame =
    counts.groupBy(col("g"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("bins"),
        sum(col("c") * log(col("c").cast("double"))).as("clc"))
      .select(col("g"), col("n"), col("bins"),
        round(log(col("n").cast("double")) - col("clc") / col("n"), 6)
          .as("entropy"),
        when(col("bins") > 1,
          round((log(col("n").cast("double")) - col("clc") / col("n")) /
            log(col("bins").cast("double")), 6)).as("evenness"))

  private def chi2FromPer(per: DataFrame): DataFrame = {
    val tot = per.groupBy(col("g"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val d = (col("ca") * col("nb") - col("cb") * col("na")).cast("double")
    per.join(tot, "g")
      .filter(col("na") > 0 && col("nb") > 0)
      // a (g, x) bin exists only if some sample observed it, but guard
      // anyway — an all-zero bin must not divide by zero
      .filter(col("ca") + col("cb") > 0)
      .groupBy(col("g"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        count(lit(1)).as("bins"),
        sum(d * d / (col("na") * col("nb") * (col("ca") + col("cb"))))
          .as("chi2raw"))
      .select(col("g"), col("na"), col("nb"), col("bins"),
        (col("bins") - 1).as("dof"), round(col("chi2raw"), 6).as("chi2"))
  }

  private def ksFromPer(per: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("x"))
    val cum = per
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val tot = per.groupBy(col("g"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.join(tot, "g")
      .filter(col("na") > 0 && col("nb") > 0)
      .groupBy(col("g"))
      .agg(first(col("na")).as("na"), first(col("nb")).as("nb"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na"))).as("num"))
      .select(col("g"), col("na"), col("nb"),
        round(col("num").cast("double") / (col("na") * col("nb")), 6).as("ks"))
  }
}
