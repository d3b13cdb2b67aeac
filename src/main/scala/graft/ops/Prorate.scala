package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) proration: split an integer total
  * across the members of a group proportionally to integer weights so
  * that the shares are whole units and SUM EXACTLY to the total — the
  * allocation problem behind "spread the order total over its line
  * items in cents", "give each stratum its share of a 100k-doc sample
  * budget", "assign token budgets to corpus slices". Floating-point
  * proration then rounding leaks units; this is the standard exact fix.
  *
  * Method, all in integer arithmetic (deterministic on any engine, no
  * rounding mode anywhere): base_i = ⌊T·w_i / W⌋ leaves a deficit
  * r = T − Σ base_i with 0 ≤ r < n; the r members with the LARGEST
  * residues (T·w_i mod W), ties broken by lowest id, get one extra
  * unit. Requires w_i ≥ 0, W > 0 per group, T ≥ 0. T·w_i must fit in a
  * long — enforced IN-OP: the product runs through `try_multiply` and a
  * row whose product overflows raises a labeled error naming the key,
  * so adversarial totals fail loudly instead of silently wrapping into
  * wrong (even negative) allocations. Callers who need bigger totals
  * should rescale units upstream (e.g. allocate thousands, not cents).
  *
  * Scale shape: one shuffle on the group key; the unordered per-group
  * sums and the residue rank share the partition, so the plan is two
  * window functions over one exchange. Per-group state is the member
  * list in one partition — groups are allocation-sized (an order's
  * lines, a language list), not corpus-sized.
  */
object Prorate {

  /** Per-member exact shares: (key, id, weight, alloc) with
    * Σ alloc = total per key. `total` must be constant within a key
    * (join it from the group table); `weight` and `total` must be
    * long-typed. */
  def largestRemainder(df: DataFrame, key: Column, id: Column,
      weight: Column, total: Column): DataFrame = {
    val part = Window.partitionBy(col("key"))
    val byResidue = part.orderBy(col("res").desc, col("id"))
    df.select(key.as("key"), id.as("id"), weight.as("w"), total.as("t"))
      .withColumn("bigw", sum(col("w")).over(part))
      // overflow guard: try_multiply yields NULL exactly on long
      // overflow (never on valid inputs — t,w are non-null by contract),
      // which the when() turns into a per-row raise_error carrying the
      // offending key. Branches of CaseWhen evaluate lazily, so clean
      // rows never touch the error path.
      .withColumn("tw", expr("try_multiply(t, w)"))
      .withColumn("tw",
        when(col("tw").isNull && col("t").isNotNull && col("w").isNotNull,
          raise_error(concat(
            lit("Prorate.largestRemainder: t*w overflows LONG for key="),
            col("key").cast("string"), lit(", id="), col("id").cast("string"),
            lit(" — rescale units upstream"))).cast("long"))
          .otherwise(col("tw")))
      // DIV, not `/`: Column./ on longs is a double divide in Spark
      .withColumn("base", expr("tw DIV bigw"))
      .withColumn("res", col("tw") % col("bigw"))
      .withColumn("deficit", col("t") - sum(col("base")).over(part))
      .withColumn("alloc",
        col("base") + when(row_number().over(byResidue) <= col("deficit"), 1L)
          .otherwise(0L))
      .select(col("key"), col("id"), col("w").as("weight"), col("alloc"))
  }
}
