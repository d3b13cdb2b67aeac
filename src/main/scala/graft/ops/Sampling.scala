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
    * of the hash ring, rotated by `offsetBp`. The offset is the audit-
    * rotation knob: gates at the same rate with offsets spaced `rateBp`
    * apart (0, r, 2r, …) select pairwise-disjoint strata whose union is
    * the whole key space, so a recurring audit that bumps the offset
    * round-robin eventually covers the corpus instead of re-reading the
    * same fixed slice forever. */
  def hashGate(key: Column, rateBp: Column, offsetBp: Column = lit(0)): Column =
    pmod(Portable.p60(key.cast("string")) + offsetBp, lit(10000)) < rateBp

  /** Uniform deterministic sample at `rateBp` basis points; `offsetBp`
    * rotates the selected stratum (see [[hashGate]]). */
  def uniform(df: DataFrame, key: Column, rateBp: Int, offsetBp: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // p60
    df.filter(hashGate(key, lit(rateBp), lit(offsetBp)))
  }

  /** α=1/2 temperature-mixing rates per source — the standard
    * source/language rebalancing of multilingual corpus work (sample
    * source s with probability ∝ n_s^α; α<1 upweights small sources,
    * α=1 is proportional, α=0 uniform). With α=1/2 the post-sample
    * expected token mass per source is ∝ sqrt(n_s): rate_bp_s =
    * min(10000, 10000·isqrt(n_min)/isqrt(n_s)), so the SMALLEST source
    * is kept whole and larger sources downsample by the sqrt ratio.
    * All arithmetic is exact at corpus magnitudes on both engines:
    * isqrt = floor(sqrt(bigint)) is exact for n ≤ 2^52 (IEEE sqrt is
    * correctly rounded and the k²−1 boundary needs k ~ 2^26 to bite),
    * and the quotient is floored from an exact-integer-valued double.
    * One aggregate over (source) rows — the rates frame is |sources|
    * and broadcasts.
    *
    * Empty-source policy: sources whose token mass is zero (or NULL)
    * are EXCLUDED from the rates frame — and therefore dropped by
    * [[sqrtTempSample]]'s inner join. Without the guard a zero-mass
    * source is catastrophic, not merely wrong: its isq=0 becomes
    * min_isq=0, flooring every OTHER source's rate to 0, while its own
    * rate is NULL (Spark division by zero), so the entire corpus
    * silently samples to empty. */
  def sqrtTempRates(docs: DataFrame, sourceCol: Column, nTokensCol: Column): DataFrame = {
    val bySource = docs.groupBy(sourceCol.as("source"))
      .agg(sum(nTokensCol).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("isq", floor(sqrt(col("n_tokens"))).cast("long"))
    val minIsq = bySource.agg(min(col("isq")).as("min_isq"))
    bySource.crossJoin(broadcast(minIsq))
      .select(col("source"), col("n_tokens"),
        least(lit(10000L),
          floor(lit(10000L) * col("min_isq") / col("isq")).cast("long")).as("rate_bp"))
  }

  /** The α=1/2 temperature sample itself: [[sqrtTempRates]] broadcast
    * back onto the corpus, gated per document by the usual hash ring —
    * scan-side filter, reproducible across runs/engines/partitionings
    * like every gate in this module. */
  def sqrtTempSample(docs: DataFrame, idCol: Column, sourceCol: Column,
      nTokensCol: Column): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession) // p60
    val rates = sqrtTempRates(docs, sourceCol, nTokensCol)
      .select(col("source").as("_ts_source"), col("rate_bp"))
    docs.join(broadcast(rates), sourceCol === col("_ts_source"))
      .filter(hashGate(idCol, col("rate_bp")))
      .drop("_ts_source", "rate_bp")
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

  /** Priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007): a
    * weighted without-replacement sample of k rows that supports
    * UNBIASED subset-sum estimation — the corpus-sampling primitive for
    * "sample documents proportionally to token count, then estimate
    * corpus token totals from the sample". Each row gets priority
    * q = w/u with u a deterministic hash uniform; the k largest
    * priorities are kept and every kept row carries the
    * Horvitz–Thompson weight ŵ = max(w, τ), τ = the (k+1)-th priority —
    * E[Σ ŵ over any fixed subset of the sample] equals that subset's
    * true Σ w.
    *
    * Cross-engine exactness (the same discipline as the cosine family,
    * but with no rounding needed before the rank): u is a dyadic
    * rational built from the TOP 52 bits of the 60-bit hash —
    * (h div 2^8 + 0.5) / 2^52 needs exactly 53 mantissa bits — and
    * q = w/u is then ONE correctly-rounded IEEE division of exact
    * inputs, so both engines rank bit-identical doubles. No ln/pow
    * anywhere (only +,-,*,/ are correctly rounded by both engines).
    *
    * Scale shape: priority is a scan-side projection; the global
    * top-(k+1) is TakeOrderedAndProject (per-partition top-k, merge of
    * k-row heads — no global sort, no full exchange); τ and the rank
    * window then run on k+1 rows. Ties (identical hash AND weight)
    * break by key.
    *
    * `key` MUST be unique per row (the same discipline [[capPerKey]]
    * demands of `tieBreak`): u is derived from the key alone, so
    * duplicate keys would share one uniform draw — correlated
    * priorities violate DLT's independence assumption and silently bias
    * the ŵ estimator, even though the emitted rows still look fine.
    * Pre-aggregate duplicate keys (summing weights) before sampling.
    *
    * `weight` MUST be positive, finite, and non-null: DLT's ŵ estimator
    * assumes w > 0, and a null/zero/negative weight yields a null or
    * non-positive priority that would silently sort to the bottom. NaN
    * is worse — it compares greater than any number in Spark SQL, so a
    * NaN weight would pass a plain `> 0` filter and its NaN priority
    * would sort to the TOP, poisoning tau/ŵ. All such rows are dropped
    * up front — w ≤ 0 or non-finite means zero inclusion probability,
    * which is exactly "not in the population".
    */
  def prioritySample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // p60
    require(k >= 1, s"sample size must be >= 1, got $k")
    val M = 1L << 52
    // top 52 of the 60 hash bits via integer shift — Column./ would cast
    // the long to double FIRST (losing bits 53-60 to rounding) and make
    // u engine-dependent
    val u = (shiftright(Portable.p60(key.cast("string")), 8).cast("double") + lit(0.5)) /
      lit(M.toDouble)
    // priority is computed in the SAME select that renames key/weight: u
    // references the caller's key column, which no longer resolves after
    // the rename drops it from the projection
    val pri = df
      .filter(weight.isNotNull && weight.cast("double") > 0 &&
        !isnan(weight.cast("double")))
      .select(key.as("key"), weight.cast("double").as("w"),
        (weight.cast("double") / u).as("priority"))
    val topK1 = pri.orderBy(col("priority").desc, col("key")).limit(k + 1)
    // k+1 rows from here on: the un-partitioned window is a deliberate
    // single-task step over a constant-size frame, not a scale hazard
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col("key"))
    val ranked = topK1.withColumn("rn", row_number().over(win))
    val tau = ranked.agg(coalesce(
      max(when(col("rn") === k + 1, col("priority"))), lit(0.0)).as("tau"))
    ranked.filter(col("rn") <= k)
      .crossJoin(broadcast(tau))
      .select(col("key"), col("w"), col("rn"),
        round(col("priority"), 6).as("priority"),
        round(greatest(col("w"), col("tau")), 6).as("w_hat"))
  }

  /** Epoch-based source UP-sampling — the other direction from
    * [[mixByTokenBudget]]'s down-sampling: a high-quality source the mix
    * calls for more-than-once-through (the "3.7 epochs of Wikipedia"
    * idiom) is repeated `fullEpochs` times whole, plus a hash-gated
    * `fracBp`/10000 partial epoch, every row tagged with its epoch
    * index. Map-side only: the repeat is an explode over a constant
    * sequence (no shuffle, no driver state), and the partial epoch
    * reuses the deterministic gate, so WHICH rows make the fractional
    * pass is stable across runs/engines/layouts — re-ingesting the
    * corpus reproduces the same mix exactly. Callers wanting a TOKEN
    * budget derive the epoch split with one aggregate:
    * fullEpochs = budget div total, fracBp = (budget mod total) ·
    * 10000 div total. */
  def epochUpsample(df: DataFrame, key: Column, fullEpochs: Int, fracBp: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession) // p60
    require(fullEpochs >= 0 && fracBp >= 0 && fracBp <= 10000,
      s"bad epoch split: $fullEpochs full + $fracBp bp")
    df.withColumn("epoch", explode(sequence(lit(0), lit(fullEpochs))))
      .filter(col("epoch") < fullEpochs || hashGate(key, lit(fracBp)))
  }

  /** Deterministic epoch shuffle: the seeded pseudo-random permutation a
    * training run reads the corpus in. The shuffle key is the portable
    * hash of (seed, key), so the order is reproducible across runs,
    * engines and partitionings — restartable training without
    * materializing a permutation table — and each seed (epoch) yields an
    * independent order. Returns the frame with a `shuffle_key` column;
    * `.orderBy(shuffle_key, key)` is a range exchange + local sort when
    * materialized (the writer path), never a single-task window — at
    * 100 TB this is exactly repartitionByRange on the hash. The key
    * tiebreak makes the order total even under hash collisions. */
  def epochShuffleKey(key: Column, seed: Int): Column =
    Portable.p60(concat_ws(":", lit(seed.toString), key.cast("string")))

  /** Deterministic negative sampling (the word2vec/ALS contrastive-pair
    * build, hash-gated like everything here): for each user in `inter`,
    * up to `k` items the user did NOT interact with, picked by hashing
    * (user, slot) into a dense item dictionary. The candidate stream is
    * |users|·`oversample` rows (linear, never the |users|×|items|
    * cross); the dictionary is |items| rows and broadcast — item
    * vocabularies are dwarfed by interaction tables wherever negative
    * sampling is meaningful; the positives anti-join is the one
    * interaction-sized shuffle. A user whose positives swallow the
    * whole oversample window yields fewer than `k` negatives —
    * deterministically so; callers widen `oversample` for pathological
    * users (P[miss] decays geometrically in it).
    *
    * The dictionary index is a row_number over a GLOBAL sort — a
    * single-task window, fine precisely because it runs on the
    * |items|-sized dictionary, never on data-sized frames (the
    * production form materializes the dictionary once and reuses it
    * across epochs). Emits (user, neg_rank 1..k, item). */
  def negativeSample(inter: DataFrame, userCol: Column, itemCol: Column,
      k: Int, oversample: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(oversample >= k, s"oversample must be >= k, got $oversample < $k")
    graft.functions.GraftFunctions.register(inter.sparkSession) // p60
    val pos = inter.select(userCol.as("user"), itemCol.as("item")).distinct()
    val dict = pos.select(col("item")).distinct()
      .withColumn("idx",
        row_number().over(Window.orderBy(col("item"))).cast("long") - 1)
    // dictionary size — a scalar, needed inside the hash-to-index mod
    val m = dict.count()
    pos.select(col("user")).distinct()
      .select(col("user"),
        explode(sequence(lit(0), lit(oversample - 1))).as("slot"))
      .withColumn("idx", pmod(
        Portable.p60(concat_ws(":", col("user").cast("string"),
          col("slot").cast("string"))), lit(m)))
      .join(broadcast(dict), "idx")
      .join(pos, Seq("user", "item"), "left_anti")
      // two slots can hash to the same item: keep the earliest slot so
      // the per-user rank order is total and collision-free
      .groupBy(col("user"), col("item")).agg(min(col("slot")).as("slot"))
      .withColumn("neg_rank", row_number()
        .over(Window.partitionBy(col("user")).orderBy(col("slot"))))
      .filter(col("neg_rank") <= k)
      .select(col("user"), col("neg_rank"), col("item"))
  }

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

  /** One DoReMi-shaped exponentiated-gradient mixture-reweight step
    * (Xie et al. 2023) from a per-(source, token) count state: each
    * source's loss is the mean cross-entropy of its tokens under the
    * corpus's OWN global unigram distribution, and the update is
    * w'_s ∝ uniform·exp(loss_s) — upweight the sources the current
    * distribution finds surprising. Counts are the SUFFICIENT
    * statistic, so the same function is the read path of the batch
    * query (q313) and the streaming monitor
    * ([[graft.streaming.EventStreams.mixtureBatch]]): stream == batch
    * holds exactly because nothing outside the counts enters.
    *
    * `counts`: a [[Drift.valueCounts]]-shaped frame (g = source,
    * x = token, c) — exact longs, |sources|×|vocab|-bounded.
    * Determinism: each per-source cross-entropy folds its (bounded-
    * vocab) token terms in token order, and the normalizer Z folds the
    * per-source terms in source order — one IEEE sequence on any
    * engine (the q291 JSD convention). Returns per source:
    * (source, n_tokens, token_share, xent_nats, weight_new). */
  def mixtureReweightFromCounts(counts: DataFrame): DataFrame = {
    val st = counts.select(col("g").as("source"), col("x").as("tk"),
        col("c"))
      .localCheckpoint(true) // |sources|x|vocab| rows; read 2 ways
    val gcnt = st.groupBy(col("tk")).agg(sum(col("c")).as("ct"))
    val tt = gcnt.agg(sum(col("ct")).as("tt"))
    val per = st.join(gcnt, "tk").crossJoin(broadcast(tt))
      .select(col("source"), col("tk"), col("c"),
        (col("c").cast("double") *
          -log(col("ct").cast("double") / col("tt").cast("double")))
          .as("v"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("nt"),
        array_sort(collect_list(struct(col("tk"), col("v")))).as("xs"))
      .select(col("source"), col("nt"),
        (expr("""aggregate(transform(xs, e -> e.v),
                |cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin)
          / col("nt").cast("double")).as("loss"))
    per.agg(array_sort(collect_list(
        struct(col("source"), col("nt"), col("loss")))).as("ss"))
      .crossJoin(broadcast(tt))
      .select(col("tt"), col("ss"),
        expr("""aggregate(
               |transform(ss, e -> exp(e.loss) / cast(size(ss) as double)),
               |cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin)
          .as("z"),
        size(col("ss")).cast("double").as("ns"))
      .select(explode(col("ss")).as("u"), col("tt"), col("z"), col("ns"))
      .select(col("u.source").as("source"), col("u.nt").as("n_tokens"),
        round(col("u.nt").cast("double") / col("tt").cast("double"), 6)
          .as("token_share"),
        round(col("u.loss"), 6).as("xent_nats"),
        round((exp(col("u.loss")) / col("ns")) / col("z"), 6)
          .as("weight_new"))
  }

  /** Document-frame front end of [[mixtureReweightFromCounts]]: one
    * token-explode scan to the count state, then the shared read. */
  def mixtureReweight(docs: DataFrame, source: Column,
      text: Column): DataFrame =
    mixtureReweightFromCounts(Drift.valueCounts(
      docs.select(source.as("source"),
        explode(Portable.tokens(text)).as("tk")),
      col("source"), col("tk")))
}
