package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable EWMA via affine segment composition — the bounded-state
  * form of the sequential recurrence e_t = (1−α)·e_{t−1} + α·x_t.
  *
  * The flat form (q198) folds over the key's WHOLE sorted history, so
  * its per-key state is the full history — honest but unbounded for a
  * pathological key. The recurrence is AFFINE: any contiguous run of
  * steps composes to e ↦ m·e + o with m = (1−α)^n and o the run's own
  * fold seeded from 0, and (m, o) pairs compose associatively
  * ((m₁,o₁) then (m₂,o₂) = (m₂m₁, m₂o₁ + o₂)). That splits the
  * computation into two bounded levels: a per-(key, segment) fold
  * whose state is ONE segment's rows (the caller picks the grain — a
  * day, an hour — to bound it), then a key-grouped ordered fold over
  * |segments| (m, o) structs. This op IS the "chunked pre-aggregation"
  * the flat form's scaladoc prescribes for huge keys, formalized.
  *
  * Seeding uses the fixed-point identity (1−α)·x + α·x = x: the
  * recurrence seeds e₁ = x₁, and applying step x₁ to e = x₁ returns
  * x₁, so seeding the first segment's composition with its own first
  * value (e = m₁·x₁ + o₁ where m₁/o₁ include x₁ as a step) reproduces
  * the flat semantics without special-casing element one.
  *
  * Exactness: identical recurrence in real arithmetic; in IEEE the
  * reassociation across segment boundaries (and the fixed-point seed)
  * perturbs at the ulp scale — ~1e−12 relative vs the flat fold,
  * OpsSpec pins 1e−9 across segment grains — far inside the repo's
  * 6dp reporting grain, which is why q205 can oracle against the flat
  * SQL. Both levels are codegen expression work (aggregate() folds),
  * no mapGroups/UDF.
  */
object Ewma {

  /** Per-key EWMA over `value` in (`order`) sequence, composed from
    * per-(key, `segment`) affine partials. `segment` must be coarser
    * than and consistent with `order` (rows of segment s all precede
    * rows of segment s' > s — a date_trunc of the order timestamp is
    * the canonical choice). Output: (key, n, ewma), ewma unrounded —
    * callers round at the reporting edge. */
  def segmented(df: DataFrame, key: Column, segment: Column,
      order: Seq[Column], value: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val beta = 1.0 - alpha
    val lvl1 = df
      .groupBy(key.as("key"), segment.as("seg"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(
          struct(order :+ value.cast("double").as("v"): _*))).as("xs"))
      .select(col("key"), col("seg"), col("n"),
        element_at(col("xs"), 1).getField("v").as("v0"),
        expr(
          s"""aggregate(xs,
             |named_struct('m', CAST(1.0 AS DOUBLE), 'o', CAST(0.0 AS DOUBLE)),
             |(acc, x) -> named_struct('m', acc.m * $beta,
             |                         'o', acc.o * $beta + $alpha * x.v))""".stripMargin)
          .as("mo"))
    lvl1
      .groupBy(col("key"))
      .agg(sum(col("n")).as("n"),
        array_sort(collect_list(struct(col("seg"), col("v0"),
          col("mo").getField("m").as("m"),
          col("mo").getField("o").as("o")))).as("segs"))
      .select(col("key"), col("n"),
        expr(
          """aggregate(slice(segs, 2, size(segs) - 1),
            |segs[0].m * segs[0].v0 + segs[0].o,
            |(acc, s) -> s.m * acc + s.o)""".stripMargin).as("ewma"))
  }
}
