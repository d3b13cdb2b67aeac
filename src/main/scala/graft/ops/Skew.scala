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
    * direct aggregation; only the shuffle layout changes.
    *
    * `salt` must be a deterministic per-row expression (an id column,
    * `hash(...)` over stable columns — NOT rand()). Under stage retry a
    * recomputed map task must emit the same (key, salt) partials as the
    * attempt whose shuffle blocks were already fetched; a
    * nondeterministic salt (even a seeded rand(), which is
    * order-dependent after an upstream shuffle) would route the same
    * row to a different sub-key on retry and double-count or drop it —
    * the SPARK-23207 failure family. Same contract as `saltedJoin`'s
    * `factSalt`. */
  def saltedCount(df: DataFrame, key: Column, salt: Column, saltBuckets: Int = 16): DataFrame =
    df.groupBy(key.as("k"), pmod(salt, lit(saltBuckets)).cast("int").as("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))

  /** Salted sum over a value column, same two-stage shape and the same
    * deterministic-salt contract as [[saltedCount]]. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salt: Column,
      saltBuckets: Int = 16): DataFrame =
    df.groupBy(key.as("k"), pmod(salt, lit(saltBuckets)).cast("int").as("salt"))
      .agg(sum(value).as("partial_s"))
      .groupBy(col("k"))
      .agg(sum(col("partial_s")).as("s"))

  /** Salted equi-join for a skewed fact side: the fact table joins on
    * (key, salt) where salt spreads each hot key's rows over
    * `saltBuckets` sub-partitions, and the (small-but-not-broadcastable)
    * build side is replicated once per salt value via a literal-range
    * explode. Result is row-identical to `fact.join(dim, key)`; only the
    * shuffle layout changes — the hot key's billions of rows land on
    * `saltBuckets` tasks instead of one. This is the manual fallback for
    * the cases AQE's skew-join split can't touch: a skewed key inside a
    * shuffle whose stats AQE never sees (cached frames), or a build side
    * Spark refuses to broadcast but the cluster could replicate k-fold.
    *
    * `factSalt` must be a deterministic per-row expression (an id
    * column, not rand()) so retried tasks resalt identically — at scale
    * a nondeterministic salt breaks exactly-once shuffle semantics under
    * stage retry (a re-executed map task would route rows differently
    * than the fetch that already succeeded).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSalt: Column, saltBuckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(factSalt, lit(saltBuckets)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
