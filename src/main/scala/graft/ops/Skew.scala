package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY "skewed keys → salting or AQE").
  *
  * AQE's skew-join handling covers joins; for aggregations over a
  * hot-key distribution the standard fix is two-stage salted
  * aggregation: spread each key over `saltBuckets` sub-keys for the
  * partial aggregate, then combine. Both stages are map-side-combining
  * hash aggregates, so the hot key's rows never all land on one task.
  */
object Skew {

  /** Salted count: groupBy(key) count, executed as
    * groupBy(key, salt) -> groupBy(key). Result is identical to the
    * direct aggregation; only the shuffle layout changes. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int = 16): DataFrame =
    df.groupBy(key.as("k"), (rand(42) * saltBuckets).cast("int").as("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))

  /** Salted sum over a value column, same two-stage shape. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBuckets: Int = 16): DataFrame =
    df.groupBy(key.as("k"), (rand(42) * saltBuckets).cast("int").as("salt"))
      .agg(sum(value).as("partial_s"))
      .groupBy(col("k"))
      .agg(sum(col("partial_s")).as("s"))
}
