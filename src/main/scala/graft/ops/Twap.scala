package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable time-weighted average (TWAP) via segment-pair composition
  * — the bounded-state form of the sequential hold-until-next fold
  * (q201: Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_n−t₀)).
  *
  * The flat form buffers each key's WHOLE sorted history. But a
  * time-weighted SUM composes over contiguous segments by plain pairs
  * — simpler than [[Ewma]]'s affine case: a segment's contribution is
  * its own interior sum Σ vᵢ·Δt plus one BOUNDARY term (the previous
  * segment's last value held across the gap to this segment's first
  * reading, v_last·(t_first′ − t_last)). So the state per segment is
  * five scalars (n, t_first, t_last, v_last, interior sum) and two
  * segments merge in O(1) — the computation splits into a per-(key,
  * segment) fold whose state is ONE segment's rows (the caller picks
  * the grain — a day, an hour — to bound it) and a key-grouped ordered
  * fold over |segments| structs. This is the chunked pre-aggregation
  * the flat fold needs for pathological keys, formalized — the same
  * prescription [[Ewma.segmented]] delivers for the EWMA recurrence.
  *
  * Exactness: identical products in real arithmetic; in IEEE the
  * ADDITION ORDER differs (per-segment sums then boundary terms vs one
  * sequential accumulation), an ulp-scale reassociation — OpsSpec pins
  * 1e-9 agreement across segment grains — far inside the repo's 6dp
  * reporting grain, which is why the segmented face can oracle against
  * the flat SQL (the q205 convention). Both levels are codegen
  * expression work (aggregate() folds), no mapGroups/UDF.
  */
object Twap {

  /** Per-key TWAP over `value`, time-weighted by `tsMicros`, composed
    * from per-(key, `segment`) partials. `order` are tiebreak columns
    * appended after the timestamp inside the sort struct (the total
    * order must match the flat form's). `segment` must be coarser than
    * and consistent with the timestamp (rows of segment s all precede
    * rows of segment s' > s — a date_trunc of the timestamp is the
    * canonical choice). Output: (key, n, span_us, twap) — twap
    * unrounded (callers round at the reporting edge), null for
    * single-reading or zero-span keys (no time to weight). */
  def segmented(df: DataFrame, key: Column, segment: Column,
      tsMicros: Column, order: Seq[Column], value: Column): DataFrame = {
    val lvl1 = df
      .groupBy(key.as("key"), segment.as("seg"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(
          struct(tsMicros.as("t") +: order :+ value.cast("double").as("v"): _*)))
          .as("xs"))
      .select(col("key"), col("seg"), col("n"),
        element_at(col("xs"), 1).getField("t").as("tf"),
        element_at(col("xs"), -1).getField("t").as("tl"),
        element_at(col("xs"), -1).getField("v").as("vl"),
        // interior sum: each reading held until the NEXT one in-segment
        expr(
          """aggregate(slice(xs, 2, size(xs) - 1),
            |named_struct('t', xs[0].t, 'v', xs[0].v, 's', CAST(0.0 AS DOUBLE)),
            |(acc, x) -> named_struct('t', x.t, 'v', x.v,
            |                         's', acc.s + acc.v * (x.t - acc.t)),
            |acc -> acc.s)""".stripMargin).as("s"))
    lvl1
      .groupBy(col("key"))
      .agg(sum(col("n")).as("n"),
        array_sort(collect_list(struct(col("seg"), col("tf"), col("tl"),
          col("vl"), col("s")))).as("segs"))
      .select(col("key"), col("n"),
        expr("segs[size(segs) - 1].tl - segs[0].tf").as("span_us"),
        // merge fold: boundary term bridges each segment gap
        expr(
          """aggregate(slice(segs, 2, size(segs) - 1),
            |named_struct('tl', segs[0].tl, 'vl', segs[0].vl, 's', segs[0].s),
            |(acc, x) -> named_struct('tl', x.tl, 'vl', x.vl,
            |  's', acc.s + acc.vl * (x.tf - acc.tl) + x.s),
            |acc -> CASE WHEN segs[size(segs) - 1].tl > segs[0].tf
            |            THEN acc.s / (segs[size(segs) - 1].tl - segs[0].tf)
            |       END)""".stripMargin).as("twap"))
  }
}
