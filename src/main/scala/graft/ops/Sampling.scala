package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing for training-data pipelines.
  *
  * Everything here is hash-gated rather than RNG-gated — the 100 TB
  * idiom: `keep iff hash(key) % 10000 < rate` is reproducible across
  * runs, engines and repartitions, needs no seed plumbed through
  * executors, never shuffles (a pure filter evaluated at the scan), and
  * composes with pushdown (the gate rides into the parquet scan's
  * post-scan filter while partition/column pruning still apply).
  * `df.sample()` by contrast is partition-order-dependent and
  * unrepeatable under AQE re-planning.
  *
  * Rates are in basis points (1/10000) so integer math is exact on both
  * engines — no float thresholds in the gate.
  */
object Sampling {

  /** The hash gate: true iff this key falls in the first `rateBp`/10000
    * of the hash ring. */
  def hashGate(key: Column, rateBp: Column): Column =
    pmod(Portable.p60(key.cast("string")), lit(10000)) < rateBp

  /** Uniform deterministic sample at `rateBp` basis points. */
  def uniform(df: DataFrame, key: Column, rateBp: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // p60
    df.filter(hashGate(key, lit(rateBp)))
  }

  /** Stratified deterministic sample: per-stratum rates in basis points,
    * unlisted strata fall back to `defaultBp` (0 = drop). This is the
    * "data mixing" primitive of LLM corpus assembly: down-weight the
    * over-represented stratum, keep the rare one at 100%. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      ratesBp: Map[String, Int], defaultBp: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // p60
    val rate = ratesBp.foldLeft(lit(defaultBp): Column) {
      case (acc, (k, bp)) => when(stratum === k, lit(bp)).otherwise(acc)
    }
    df.filter(hashGate(key, rate))
  }

  /** Deterministic per-key cap: keep at most `k` rows per key, chosen by
    * hash order (so the kept subset is stable across runs and layouts,
    * and unbiased w.r.t. any natural ordering of the data). The corpus
    * "max N documents per domain / events per user" primitive. One
    * window shuffle on the key; `tieBreak` must be unique within a key
    * for full determinism. A pathologically hot key buffers its
    * partition in the window — pre-filter such keys with [[stratified]]
    * (rate them down) before capping if that's a real risk. */
  def capPerKey(df: DataFrame, key: Column, tieBreak: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // p60
    // collision-safe temp column: don't clobber a user column of the
    // same name
    val rn = Iterator.from(0).map(i => s"__graft_rn_cap$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(Portable.p60(tieBreak.cast("string")), tieBreak)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Weighted interleave of same-schema sources, tagged by origin: each
    * source is hash-sampled to its weight, then unioned — no shuffle,
    * no global sort; downstream repartitioning (if any) does the
    * physical interleaving. */
  def mix(sources: Seq[(String, DataFrame, Int)], key: String): DataFrame =
    sources.map { case (tag, df, rateBp) =>
      uniform(df, col(key), rateBp).withColumn("source", lit(tag))
    }.reduce(_.unionByName(_))

  /** Token-budget-aware mixing — how training mixes are actually
    * specified ("this many tokens of code, this many of web"), while
    * [[mix]] weights rows. Each source's gate rate is derived from its
    * own token total: rateBp = min(10000, budget·10000 div total), an
    * exact-integer computation on both engines. The total is a one-row
    * aggregate broadcast back over the source — no driver action, no
    * collect — and the gate stays a deterministic hash filter, so the
    * achieved token count converges on the budget (rows are hash-random,
    * token-weighted in expectation) and the sample still nests/replays
    * like every other gate here. A source whose total is under budget
    * clamps to keep-all.
    *
    * Sources: (origin tag, frame holding `keyCol` + `tokenCol`, token
    * budget). Emits (origin, key, n_tokens).
    */
  def mixByTokenBudget(sources: Seq[(String, DataFrame, Long)],
      keyCol: String = "doc_id", tokenCol: String = "n_tokens"): DataFrame =
    sources.map { case (tag, df, budget) =>
      graft.functions.GraftFunctions.register(df.sparkSession) // p60
      val total = df.agg(sum(col(tokenCol)).cast("long").as("__graft_total_tokens"))
      df.crossJoin(broadcast(total))
        .withColumn("__graft_rate_bp",
          least(lit(10000L), expr(s"CAST(${budget}L * 10000 AS BIGINT) DIV __graft_total_tokens")))
        .filter(hashGate(col(keyCol), col("__graft_rate_bp")))
        .select(lit(tag).as("origin"), col(keyCol).as("key"),
          col(tokenCol).cast("long").as("n_tokens"))
    }.reduce(_.unionByName(_))
}
