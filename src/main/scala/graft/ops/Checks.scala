package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, Deequ-style (Schelter et al.,
  * VLDB 2018 — the public constraint-suite pattern): a check suite is
  * DECLARED, compiled into aggregate expressions, and evaluated in ONE
  * pass over the table — (checks, metric, passed) out, never one job
  * per check.
  *
  * Scale shape: every metric here is a map-side-combinable aggregate,
  * so the whole suite costs one scan + one 1-row reduction regardless
  * of how many checks it carries. The exception is [[Unique]], whose
  * exact distinct forces its own expansion; Spark plans n distinct
  * aggregates as a single multi-expand job (still one scan of the
  * source). For a 100 TB nightly gate where exact uniqueness is
  * overkill, [[ApproxUnique]] swaps in HLL distinct (fully mergeable,
  * fixed state) under a stated tolerance.
  */
object Checks {

  /** One declared constraint: a metric over the table and a pass
    * predicate on that metric's value. */
  sealed trait Check {
    def name: String
    /** the metric's aggregate expression (must be a valid agg Column) */
    def metric: Column
    /** pass/fail as an expression over the computed metric */
    def passed(metric: Column): Column
  }

  /** Fraction of non-null values >= `atLeast`. */
  final case class Complete(colName: String, atLeast: Double = 1.0) extends Check {
    val name = s"complete($colName)>=$atLeast"
    def metric: Column = avg(when(col(colName).isNotNull, 1.0).otherwise(0.0))
    def passed(m: Column): Column = m >= atLeast
  }

  /** Exact distinct-count of the key == row count (a primary key). */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
    def metric: Column =
      countDistinct(col(cols.head), cols.tail.map(col): _*).cast("double") /
        count(lit(1))
    def passed(m: Column): Column = m === 1.0
  }

  /** HLL distinct within `tolerance` of the row count — the mergeable
    * 100 TB stand-in for [[Unique]]. The sketch's relative standard
    * deviation is sized to tolerance/2 so the estimate error sits
    * comfortably inside the declared band (default rsd 0.05 observably
    * misses a 5% band — ~6.7% error on small keys). */
  final case class ApproxUnique(cols: Seq[String], tolerance: Double = 0.05)
      extends Check {
    val name = s"approx_unique(${cols.mkString(",")})~$tolerance"
    def metric: Column =
      approx_count_distinct(struct(cols.map(col): _*), tolerance / 2)
        .cast("double") / count(lit(1))
    def passed(m: Column): Column = abs(m - 1.0) <= tolerance
  }

  /** Every non-null value inside [lo, hi]. */
  final case class Bounds(colName: String, lo: Double, hi: Double) extends Check {
    val name = s"bounds($colName)[$lo,$hi]"
    def metric: Column =
      avg(when(col(colName).isNull || (col(colName) >= lo && col(colName) <= hi),
        1.0).otherwise(0.0))
    def passed(m: Column): Column = m === 1.0
  }

  /** Every non-null value drawn from `allowed`. */
  final case class InSet(colName: String, allowed: Seq[String]) extends Check {
    val name = s"in_set($colName){${allowed.mkString(",")}}"
    def metric: Column =
      avg(when(col(colName).isNull || col(colName).isin(allowed: _*), 1.0)
        .otherwise(0.0))
    def passed(m: Column): Column = m === 1.0
  }

  /** Fraction of non-null values matching `regex` >= `atLeast`
    * (Java∩RE2 dialect — the Portable convention). The regex is part of
    * the name — two Matches on one column with the same threshold but
    * different patterns are distinct declarations, and the
    * fully-parameterized-name contract (run()'s dup guard) requires
    * every parameter that changes the metric to appear in the id. */
  final case class Matches(colName: String, regex: String, atLeast: Double)
      extends Check {
    val name = s"matches($colName,$regex)>=$atLeast"
    def metric: Column = avg(when(col(colName).isNull, null)
      .otherwise(when(regexp_like(col(colName), lit(regex)), 1.0).otherwise(0.0)))
    def passed(m: Column): Column = m >= atLeast
  }

  /** Evaluate the suite: one aggregation over `df`, one output row per
    * check — (check, metric 6dp, passed). Metric expressions all ride
    * the same Aggregate node; the 1×n result is exploded driver-side
    * (n = suite size, scalar work).
    *
    * Verdict nullability: on an EMPTY table (or an all-null column
    * under [[Matches]]) every avg/ratio metric is NULL, so the raw pass
    * predicate is NULL too — `passed` coalesces that to false. A gate
    * reading `passed` as Boolean must fail closed on a table with no
    * evidence, not throw on unboxing or silently treat the check as
    * not-failed. The metric column stays NULL in that case (the honest
    * "no data" signal). Check names carry their parameters, so every
    * declared check has a distinct identifier (two Bounds on one column
    * no longer collide) — run() rejects duplicate fully-parameterized
    * names rather than letting a consumer keying on check_name lose
    * verdicts. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val dup = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dup.isEmpty, s"duplicate check declarations: ${dup.mkString("; ")}")
    val agg = df.agg(checks.head.metric.as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.metric.as(s"m${i + 1}") }: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        round(col(s"m$i"), 6).as("metric"),
        coalesce(c.passed(col(s"m$i")), lit(false)).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Referential-integrity check: fraction of NON-NULL fact keys
    * present in the dim key set >= `atLeast` (1.0 = a true foreign
    * key; lower thresholds tolerate known orphan rates). Unlike the
    * single-scan suite, containment inherently reads TWO tables, so it
    * runs as its own job — a distinct-key existence join (broadcast
    * when dim keys are small, shuffled otherwise; Catalyst's call) +
    * one avg — and emits the same (check_name, metric, passed) row
    * shape, so gates consume one verdict stream either way. The
    * verdict applies to the UNROUNDED metric (the [[run]] convention —
    * a 1e−7 orphan rate at a 1.0 threshold must fail even though the
    * 6dp-reported metric reads 1.0); the rounding is presentation
    * only. An all-null or empty fact side has no evidence: metric
    * NULL, passed false (the suite's fail-closed convention). */
  def containment(fact: DataFrame, factCol: String, dim: DataFrame,
      dimCol: String, atLeast: Double = 1.0): DataFrame = {
    val keys = dim.select(col(dimCol).as("_k")).distinct()
      .withColumn("_hit", lit(1))
    fact.select(col(factCol).as("_fk"))
      .filter(col("_fk").isNotNull)
      .join(keys, col("_fk") === col("_k"), "left")
      .agg(avg(when(col("_hit").isNotNull, 1.0).otherwise(0.0)).as("_raw"))
      .select(
        lit(s"contained($factCol in $dimCol)>=$atLeast").as("check_name"),
        round(col("_raw"), 6).as("metric"),
        coalesce(col("_raw") >= atLeast, lit(false)).as("passed"))
  }
}
