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
}
