package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed evaluation statistics with exact-arithmetic contracts —
  * the reusable cores behind the q286/q287 registry faces.
  *
  * Both operators follow the library's cross-engine determinism rules:
  * decisions (sampling, ranking, selection) happen on exact longs;
  * doubles appear only in final single divisions, which are
  * correctly-rounded IEEE ops and therefore bit-identical on any
  * engine replaying the same integers. */
object Stats {

  /** floor(CDF_Poisson(1)(k) · 2⁶⁰) for k = 0..8 — the integer
    * thresholds that turn a uniform 60-bit hash into a Poisson(1)
    * replicate weight without any float in the sampling path. The
    * w ≥ 9 tail (p ≈ 1.1e-6) is capped at 9: its contribution to a
    * replicate mean is orders of magnitude below CI width.
    * StatsEvalSpec pins this table to a from-scratch recomputation. */
  val PoissonThresholds: Seq[Long] = Seq(
    424136118829305344L, 848272237658610688L, 1060340297073263360L,
    1131029650211480960L, 1148701988496035328L, 1152236456152946176L,
    1152825534095764608L, 1152909688087595776L, 1152920207336574720L)

  /** Poisson-bootstrap percentile CI for the mean of `value` (an exact
    * long column, e.g. floor-cents): ONE scan, `b` simultaneous
    * replicates. Each row enters replicate i with weight
    * Poisson(1)(hash(id, i)) — the classical multinomial resample's
    * n→∞ limit — so no resampling passes exist; the b× row inflation
    * is collapsed by the map-side partial aggregate (the exchange
    * carries b rows per task). Replicate means are exact-long Σwc/Σw
    * single divisions; the interval is an order-statistic pick
    * (`drop`-th from each end of the sorted means — no
    * interpolation). Returns one row:
    * (n, mean_cents, ci_lo, ci_hi). Σw = 0 replicates (p ≈ e^(−n))
    * null their mean explicitly rather than inheriting engine /0
    * semantics — and those NULL means are then FILTERED before the
    * order-statistic pick, with the upper index taken relative to the
    * filtered length: Spark's collect_list drops NULLs while DuckDB's
    * list() keeps them (sorted NULLS-first), so any scheme that keeps
    * NULLs or indexes off the constant `b` would make the two engines
    * pick different order statistics in exactly the degenerate case
    * the guard exists for (r18 advice).
    *
    * `id` must be unique per row (it seeds the weight hash). */
  def poissonBootstrapCi(df: DataFrame, id: Column, value: Column,
      b: Int = 64, drop: Int = 1): DataFrame = {
    require(b >= 4 && drop >= 1 && 2 * drop < b,
      s"need at least 4 replicates and 2*drop < b, got b=$b drop=$drop")
    val base = df.select(id.cast("string").as("_id"), value.as("c"))
    val h = Portable.p60(concat(col("_id"), lit(":"), col("b").cast("string")))
    val w = PoissonThresholds.zipWithIndex.foldRight(lit(9): Column) {
      case ((thr, k), els) => when(col("h") < thr, lit(k)).otherwise(els)
    }
    val reps = base
      .select(col("_id"), col("c"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("h", h)
      .withColumn("w", w.cast("long"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("nw"), sum(col("w") * col("c")).as("sw"))
      .select(when(col("nw") > 0,
        col("sw").cast("double") / col("nw").cast("double")).as("m"))
      .filter(col("m").isNotNull)
    val ci = reps.agg(sort_array(collect_list(col("m"))).as("ms"))
    base.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      .crossJoin(broadcast(ci))
      .select(col("n"),
        round(col("sc").cast("double") / col("n").cast("double"), 6)
          .as("mean_cents"),
        round(element_at(col("ms"), drop + 1), 6).as("ci_lo"),
        // -(drop+1): drop-th from the END of the FILTERED list —
        // equals ms[b-drop] whenever no replicate degenerated
        round(element_at(col("ms"), -(drop + 1)), 6).as("ci_hi"))
  }

  /** Exact AUC (Mann-Whitney U with tie handling) of an integer-valued
    * `score` against a binary `label` (0/1 long). Computed from
    * per-SCORE-VALUE group counts: 2U = Σ_g (2·p_g·negbelow_g +
    * p_g·q_g) — wins count double, ties once — all exact longs; AUC is
    * the single division 2U / (2·P·N), emitted UNROUNDED
    * (bit-identical cross-engine). Returns one row:
    * (n_groups, n_pos, n_neg, auc); auc is NULL when either class is
    * empty.
    *
    * Scale: no per-row sort and no P×N pair join anywhere — the only
    * ordered structure is a prefix window over the DISTINCT-score
    * frame, whose size is bounded by the score's domain (pre-bucket a
    * continuous score to keep that bound; StatsEvalSpec pins this
    * grouped form to the brute-force pairwise definition). */
  def auc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.as("score"), label.as("pos"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.select(col("p"), (col("n") - col("p")).as("q"),
        coalesce(sum(col("n") - col("p")).over(w), lit(0L)).as("negbelow"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(lit(2L) * col("p") * col("negbelow") +
          col("p") * col("q")).as("num2"))
      .select(col("n_groups"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("num2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Sign-flip (paired-permutation) test for H0: the per-unit integer
    * difference `diff` is symmetric around 0. The q286 hash-replicate
    * construction applied to the permutation null: replicate r flips
    * each unit's sign by the parity of a 60-bit hash of (id, r), the
    * replicate statistic is the plain signed SUM — commutative exact
    * longs, so unlike a mean of doubles it is order-free across any
    * partitioning — and the p-value is the standard add-one
    * (1 + #{r : |S_r| >= |S_obs|}) / (1 + R). EVERY decision in the
    * test (sign, comparison, count) is integer arithmetic; the single
    * double division is the reported p. Complements [[auc]]/Welch
    * (q281) with the assumption-free member of the testing family.
    *
    * Scale: the r× row inflation lives between the scan and the
    * map-side partial aggregate (exchange carries `reps` rows per
    * task); the final compare runs on one `reps`-row frame.
    *
    * `id` must be unique per unit; `diff` an exact-long difference. */
  def signFlipTest(df: DataFrame, id: Column, diff: Column,
      reps: Int = 256): DataFrame = {
    require(reps >= 16, s"need at least 16 replicates, got $reps")
    val base = df.select(id.cast("string").as("_id"), diff.as("d"))
      .localCheckpoint(true) // one scan feeds both the obs and rep sums
    val obs = base.agg(count(lit(1)).as("n_units"),
      sum(col("d")).as("stat_obs"))
    val h = Portable.p60(concat(col("_id"), lit(":"), col("r").cast("string")))
    val repStats = base
      .select(col("_id"), col("d"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .withColumn("s", when(h % 2 === 0, col("d")).otherwise(-col("d")))
      .groupBy(col("r"))
      .agg(sum(col("s")).as("stat"))
    repStats.crossJoin(broadcast(obs))
      .agg(max(col("n_units")).as("n_units"),
        max(col("stat_obs")).as("stat_obs"),
        sum(when(abs(col("stat")) >= abs(col("stat_obs")), 1L)
          .otherwise(0L)).as("n_extreme"),
        count(lit(1)).as("n_reps"))
      .select(col("n_units"), col("stat_obs"), col("n_extreme"),
        col("n_reps"),
        round((lit(1L) + col("n_extreme")).cast("double") /
          (lit(1L) + col("n_reps")).cast("double"), 6).as("p_value"))
  }

  /** Theil–Sen robust trend over an AGGREGATED (x, y) frame: the
    * median of all pairwise slopes (y_j−y_i)/(x_j−x_i), x_j > x_i,
    * plus the matching median-residual intercept — the
    * outlier-immune replacement for OLS on a drifting daily metric
    * (one corrupted day moves OLS arbitrarily, moves Theil–Sen not at
    * all until half the days are corrupt).
    *
    * Scale contract: callers aggregate to the BOUNDED x domain first
    * (days, hours, versions — q98's bounded-domain convention), so the
    * pair frame is |domain|² of a frame that fits one partition, never
    * row-level pairs. Each slope is ONE division of exact longs —
    * identical IEEE doubles on any engine — and the median is an
    * order-statistic pick over the sorted slope list (even count
    * averages the two middles: one add, one halving, both exact-ish
    * IEEE ops replayed identically cross-engine).
    *
    * `x`, `y` must be exact longs; one row out:
    * (n_points, n_pairs, slope, intercept), 6dp-rounded at the edge. */
  def theilSen(df: DataFrame, x: Column, y: Column): DataFrame = {
    val d = df.select(x.as("x"), y.as("y")).localCheckpoint(true)
    val a = d.select(col("x").as("xa"), col("y").as("ya"))
    val b = d.select(col("x").as("xb"), col("y").as("yb"))
    val slopes = a.join(b, col("xb") > col("xa"))
      .select(((col("yb") - col("ya")).cast("double") /
        (col("xb") - col("xa")).cast("double")).as("slope"))
    val med = slopes
      .agg(sort_array(collect_list(col("slope"))).as("sl"),
        count(lit(1)).as("np"))
      .select(col("np"),
        when(col("np") % 2 === 1,
          element_at(col("sl"), ((col("np") + 1) / 2).cast("int")))
          .otherwise((element_at(col("sl"), (col("np") / 2).cast("int")) +
            element_at(col("sl"), (col("np") / 2 + 1).cast("int"))) / 2d)
          .as("sen"))
    d.crossJoin(broadcast(med))
      .select(col("np"), col("sen"),
        (col("y").cast("double") - col("sen") * col("x").cast("double"))
          .as("resid"))
      .groupBy(col("np"), col("sen"))
      .agg(sort_array(collect_list(col("resid"))).as("il"),
        count(lit(1)).as("nd"))
      .select(col("nd").as("n_points"), col("np").as("n_pairs"),
        round(col("sen"), 6).as("slope"),
        round(when(col("nd") % 2 === 1,
          element_at(col("il"), ((col("nd") + 1) / 2).cast("int")))
          .otherwise((element_at(col("il"), (col("nd") / 2).cast("int")) +
            element_at(col("il"), (col("nd") / 2 + 1).cast("int"))) / 2d), 6)
          .as("intercept"))
  }

  /** Doubled within-block Friedman midranks over COMPLETE blocks only —
    * the rank layer of the Friedman test (q332). Input contract: one
    * row per (block, group) cell. Blocks missing any of the k groups
    * are dropped (the standard repeated-measures requirement). Callers
    * whose downstream statistic hard-codes k (q332's 5n/100n/×3
    * constants assume k=4) MUST pass it explicitly: with `k = Some(kk)`
    * the completeness filter is `count == kk`, so a globally-absent
    * group drops every block — matching an oracle's
    * `HAVING count(*) = kk` — instead of silently ranking (k−1)-cell
    * blocks against k-based constants. With `k = None` (exploratory
    * use) it is inferred as the global distinct-group count. Ranks come
    * from the within-block self-join — blocks are k rows, so the join
    * is k²-per-block bounded, never row-sized — and are kept doubled
    * (2r = 2·#less + #tied-incl-self + 1) so downstream rank sums and
    * the tie-corrected statistic stay exact-long to the final
    * division. Returns (blk, g, r2). The complete-block branch cannot
    * fire on the driver fixtures (every week is complete at all SFs —
    * probed), so StatsEvalSpec pins it on synthetic input instead. */
  def friedmanRanks(df: DataFrame, block: Column, group: Column,
      value: Column, k: Option[Int] = None): DataFrame = {
    val cells = df.select(block.as("blk"), group.as("g"), value.as("y"))
    val counts = cells.groupBy(col("blk")).agg(count(lit(1)).as("c"))
    val full = (k match {
      case Some(kk) => counts.filter(col("c") === lit(kk.toLong))
      case None =>
        val kd = cells.agg(count_distinct(col("g")).as("k"))
        counts.crossJoin(broadcast(kd)).filter(col("c") === col("k"))
    }).select(col("blk"))
    val cb = cells.join(full, Seq("blk"), "left_semi")
      .localCheckpoint(true) // |blocks×k| rows, read twice (self-join)
    cb.as("a").join(cb.as("b"), col("a.blk") === col("b.blk"))
      .groupBy(col("a.blk").as("blk"), col("a.g").as("g"))
      .agg((lit(2L) *
        sum(when(col("b.y") < col("a.y"), 1L).otherwise(0L)) +
        sum(when(col("b.y") === col("a.y"), 1L).otherwise(0L)) +
        lit(1L)).as("r2"))
  }

  /** UCB1 scores and the allocation choice from per-arm pull/success
    * counts (`g`, `n`, `successes`) — the read layer shared by the
    * q335 batch face and the streaming bandit monitor
    * (EventStreams.banditBatch): mean + √(2 ln N / n), choice on the
    * raw double with arm-id tiebreak, reported 6dp. The counts are
    * the rule's sufficient statistic, so the stream view equals the
    * one-shot batch BYTE-identically (the mixtureBatch argument). */
  def ucbFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n")).as("nn"))
    counts.crossJoin(broadcast(tot))
      .select(col("g"), col("n"), col("successes"),
        (col("successes").cast("double") / col("n").cast("double") +
          sqrt(lit(2d) * log(col("nn").cast("double")) /
            col("n").cast("double"))).as("u"))
      .select(col("g"), col("n"), col("successes"),
        round(col("successes").cast("double") /
          col("n").cast("double"), 6).as("mean_reward"),
        round(col("u"), 6).as("ucb"),
        when(row_number().over(
          Window.orderBy(col("u").desc, col("g"))) === 1, 1L)
          .otherwise(0L).as("chosen"))
      .orderBy(col("g"))
  }

  /** Merge per-arm count states (exact-long sums on the bounded arm
    * domain) — the fold step of the streaming bandit monitor. */
  def mergeArmCounts(states: Seq[DataFrame]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"), sum(col("successes")).as("successes"))
}
