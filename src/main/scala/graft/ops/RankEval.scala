package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline ranking-quality metrics — the evaluation harness any
  * recommender/retrieval pipeline needs next to the model itself
  * (W2's ALS, the ANN family, BM25): per user, compare a top-k
  * recommendation list against a held-out relevant set under binary
  * relevance and report hits, precision@k, recall@k, NDCG@k and MRR@k.
  *
  * Determinism: hits/counts are integers; precision/recall are
  * rounded rationals; DCG/IDCG/MRR involve only 1/log2(p+1) for
  * integer positions p ≤ k — both engines feed libm identical small
  * integers, so the 6dp round is over ulp-level jitter only (the q211
  * argument). IDCG is computed per row from the ideal prefix
  * min(k, |relevant|) with a bounded fold — no join against a numbers
  * table.
  *
  * Scale shape: one equi-join of the k·|users| recommendation rows
  * against the relevant set (both user-keyed — co-partitioned at
  * scale), one per-user aggregate, one |users|-sized join to the
  * relevant-set sizes. Nothing is per-item quadratic; evaluation cost
  * is recommendation-volume-bound, which is what lets the eval run on
  * every model build.
  */
object RankEval {

  /** `recs`: (user, item, rank 1..k, rank gap-free per user);
    * `truth`: (user, item) distinct relevant pairs. Returns per-user
    * (user, n_rel, hits, precision, recall, ndcg, mrr) for users
    * present in BOTH frames (no relevant set → nothing to measure —
    * surface those with an anti-join upstream if needed). MRR is 0
    * when no recommended item is relevant (the usual convention), not
    * null. */
  def metrics(recs: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = truth.select(col("user").as("tu"), col("item").as("ti")).distinct()
    val relSizes = t.groupBy(col("tu")).agg(count(lit(1)).as("n_rel"))
    val flagged = recs
      .join(t, recs("user") === t("tu") && recs("item") === t("ti"), "left")
      .select(recs("user"), col("rank"), col("ti").isNotNull.as("hit"))
    val per = flagged.groupBy(col("user"))
      .agg(
        sum(when(col("hit"), 1L).otherwise(0L)).as("hits"),
        coalesce(sum(when(col("hit"),
          lit(1.0) / log2(col("rank") + 1))), lit(0.0)).as("dcg"),
        min(when(col("hit"), col("rank"))).as("first_hit"))
    val idcg = expr(
      s"""aggregate(sequence(1, int(least($k, n_rel))),
         |CAST(0.0 AS DOUBLE), (acc, p) -> acc + 1.0 / log2(p + 1))""".stripMargin)
    per.join(relSizes, per("user") === relSizes("tu"))
      .select(col("user"), col("n_rel"), col("hits"),
        round(col("hits").cast("double") / k, 6).as("precision"),
        round(col("hits").cast("double") / col("n_rel"), 6).as("recall"),
        round(col("dcg") / idcg, 6).as("ndcg"),
        round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6).as("mrr"))
  }

  /** Rank-biased overlap between two rankings (Webber et al. 2010,
    * the truncated prefix-weight form): (1−p)·Σ_{d=1..k}
    * p^(d−1)·|A_d ∩ B_d|/d, where A_d/B_d are the depth-d prefixes.
    * Compares two RANKINGS directly — no relevance labels — so it
    * answers "did the new ranker change what users see", top-weighted.
    * `a`/`b`: (pk, rk) frames with gap-free ranks 1..k (build them
    * with [[graft.ops.GroupTopK]] — never a corpus-domain window).
    * Returns one row (n_common, agree_at_k, rbo, rbo_ub): `rbo` is
    * the truncated partial sum (the lower envelope — every unseen
    * depth assumed disjoint) and `rbo_ub` adds the residual weight
    * p^k (every unseen depth assumed in full agreement), so the true
    * untruncated RBO lies in [rbo, rbo_ub] — reporting the band keeps
    * the truncation honest. Determinism: the overlap-at-depth counts
    * are exact longs from a bounded k×overlap expansion; the weight
    * series folds in depth order (p^(d−1) via power() — 1-ulp libm
    * exposure under the 6dp round, the ln/exp precedent). Scale:
    * everything after the (already tiny) rank frames is ≤ k² rows. */
  def rbo(a: DataFrame, b: DataFrame, k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    val spark = a.sparkSession
    val mx = a.select(col("pk"), col("rk").as("ra"))
      .join(b.select(col("pk"), col("rk").as("rb")), "pk")
      .select(greatest(col("ra"), col("rb")).as("mx"))
      .localCheckpoint(true) // ≤ k rows
    // x_d = |A_d ∩ B_d| per depth: a k×overlap bounded expansion
    val xd = spark.range(1, k + 1).toDF("dd")
      .join(broadcast(mx), col("mx") <= col("dd"), "left")
      .groupBy(col("dd")).agg(count(col("mx")).as("x"))
    xd.agg(array_sort(collect_list(struct(col("dd"), col("x")))).as("xs"))
      .select(expr(
        s"""aggregate(
          |transform(xs, e -> power(cast($p as double),
          |  cast(e.dd - 1 as double))
          |  * (cast(e.x as double) / cast(e.dd as double))),
          |cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin)
        .as("sm"),
        element_at(col("xs"), k).getField("x").as("xk"))
      .crossJoin(broadcast(mx.agg(count(lit(1)).as("n_common"))))
      .select(col("n_common"),
        round(col("xk").cast("double") / lit(k.toDouble), 6)
          .as("agree_at_k"),
        round(lit(1.0 - p) * col("sm"), 6).as("rbo"),
        round(lit(1.0 - p) * col("sm") + pow(lit(p), lit(k.toDouble)), 6)
          .as("rbo_ub"))
  }
}
