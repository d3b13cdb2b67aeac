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
  * Contract: [[partial]]/[[merge]]/[[finish]] are insert-only. min/max
  * are NOT mergeable under deletion — there is no inverse for "took the
  * max" — so the retraction-aware face ([[partialDelta]] /
  * [[mergeDelta]] / [[finishDelta]]) maintains count/sum/mean exactly
  * via signed weights and FLAGS the keys whose stored bounds a delete
  * touched (`needs_rebuild`) instead of quietly publishing stale
  * extremes.
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

  // ---- retraction-aware face (signed weights / CDC deltas) ----------
  //
  // The insert-only contract above is honest about WHY: count/sum are
  // abelian-group aggregates (every insert has an inverse), min/max are
  // only a semilattice (no inverse — you cannot un-take a max). The
  // delta face therefore maintains count/sum/mean EXACTLY under
  // retraction via signed weights, keeps min/max as insert-side bounds,
  // and tracks the retracted extremes so [[finishDelta]] can flag the
  // precise keys whose bounds are no longer trustworthy
  // (`needs_rebuild`) instead of quietly publishing a stale extremum.
  // That is the standard incremental-view-maintenance treatment of
  // non-invertible aggregates: rebuild exactly the keys where a delete
  // touched the stored bound, keep the group-aggregates incremental.
  //
  // Contract: deletes must retract previously-inserted (key, value)
  // rows (CDC discipline — the reconcile module q170 is the audit tool
  // when that is in doubt). A delete of a never-inserted value can
  // produce needs_rebuild=true spuriously but never a wrong cnt/sum
  // verdict silently.

  /** Aggregate one delta batch into per-key mergeable state. `weight`
    * is +1 for inserts, -1 for deletes (any long weight works — e.g.
    * collapsed CDC multiplicities). Nulls carry no weight, matching
    * [[partial]]'s count(value) semantics. */
  def partialDelta(df: DataFrame, key: Column, value: Column,
      weight: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(
        coalesce(sum(when(value.isNotNull, weight)), lit(0L)).as("cnt"),
        sum(value * weight).as("sum"),
        min(when(weight > 0, value)).as("vmin"),
        max(when(weight > 0, value)).as("vmax"),
        min(when(weight < 0, value)).as("dmin"),
        max(when(weight < 0, value)).as("dmax"))

  /** Merge delta-state frames (associative + commutative, same as
    * [[merge]]): counts/sums add, insert bounds and retracted bounds
    * each fold by min/max. */
  def mergeDelta(partials: Seq[DataFrame]): DataFrame = {
    require(partials.nonEmpty, "mergeDelta needs at least one partial frame")
    partials.reduce(_.unionByName(_))
      .groupBy(col("key"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        min(col("dmin")).as("dmin"),
        max(col("dmax")).as("dmax"))
  }

  /** Read-time derivation: exact cnt/sum/mean under retraction; vmin /
    * vmax are the INSERT-side bounds, still exact for any key where no
    * delete touched an extremum; `needs_rebuild` is true exactly when a
    * retracted value reaches the stored bound (dmin <= vmin or dmax >=
    * vmax) — a delete strictly inside the range can never move min/max,
    * so everything else stays incrementally exact. A key retracted to
    * emptiness (cnt = 0) reports null mean. */
  def finishDelta(state: DataFrame): DataFrame =
    state.select(
      col("key"), col("cnt"), col("sum"), col("vmin"), col("vmax"),
      when(col("cnt") > 0, col("sum") / col("cnt")).as("mean"),
      coalesce(col("dmin") <= col("vmin"), lit(false))
        .or(coalesce(col("dmax") >= col("vmax"), lit(false)))
        .as("needs_rebuild"))

  /** The repair pass that completes the retraction story: recompute
    * min/max from the LIVE fact table for exactly the keys
    * [[finishDelta]] flags, leave every other key's state untouched —
    * after it, `needs_rebuild` is false everywhere and finishDelta's
    * bounds are exact again.
    *
    * Scale shape: the flagged-key list is a (typically tiny) subset of
    * the |keys|-sized state, BROADCAST into a semi-join that gates the
    * fact scan — so the recompute reads only flagged keys' rows, not
    * the corpus (on a key-bucketed/partitioned fact table the gate
    * prunes at the scan; worst case it is one filtered pass, still
    * never per-unflagged-key work). The merge back is a |keys|-sized
    * broadcast left join. This is the standard incremental-view
    * treatment of non-invertible aggregates: maintain the abelian part
    * (count/sum) incrementally forever, rebuild the semilattice part
    * (min/max) only where a delete actually touched a stored bound.
    *
    * `facts` must be the current LIVE rows (inserts minus deletes — the
    * same CDC discipline partialDelta documents; Reconcile/q189 derives
    * it when in doubt). A flagged key retracted to emptiness gets null
    * bounds, matching SQL min/max over no rows. Returns a delta-state
    * frame (same schema as [[mergeDelta]]) with the repaired keys'
    * retraction trackers cleared. */
  def rebuildFlagged(state: DataFrame, facts: DataFrame, key: Column,
      value: Column): DataFrame = {
    // the flag is derived INLINE on the state row (not via a separate
    // finishDelta join), so `state` is referenced twice total — once
    // for the output row set, once (through `flagged`) for the fact
    // gate — instead of four times; on a non-materialized state
    // lineage that halves the recompute (persisted state tables, the
    // production shape, are indifferent). All key joins are NULL-SAFE
    // (<=>): a null-key group is a legitimate aggregation group and
    // must repair like any other, not stay flagged forever.
    val marked = state.withColumn("rebuilt",
      coalesce(col("dmin") <= col("vmin"), lit(false))
        .or(coalesce(col("dmax") >= col("vmax"), lit(false))))
    val flagged = marked.filter(col("rebuilt")).select(col("key").as("_fk"))
    val rebuilt = facts.select(key.as("_rk"), value.as("_v"))
      .join(broadcast(flagged), col("_rk") <=> col("_fk"), "left_semi")
      .groupBy(col("_rk"))
      .agg(min(col("_v")).as("rmin"), max(col("_v")).as("rmax"))
    // the repair marker rides the state row's own flag: a flagged key
    // retracted to emptiness has no live rows and thus no rebuilt row,
    // but must still be repaired — to null bounds
    marked.join(broadcast(rebuilt), col("key") <=> col("_rk"), "left")
      .select(col("key"), col("cnt"), col("sum"),
        when(col("rebuilt"), col("rmin")).otherwise(col("vmin")).as("vmin"),
        when(col("rebuilt"), col("rmax")).otherwise(col("vmax")).as("vmax"),
        // clearing the retraction trackers is what un-flags the key:
        // the stored bound is exact again, so past deletes are history
        when(!col("rebuilt"), col("dmin")).as("dmin"),
        when(!col("rebuilt"), col("dmax")).as("dmax"))
  }
}
