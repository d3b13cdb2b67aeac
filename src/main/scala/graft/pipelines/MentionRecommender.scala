package graft.pipelines

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Workload-2 rebuild: implicit-feedback ALS recommender, per the
  * reference pipeline at COMP5349_2.py:196-211 (mentions-graph analog:
  * events users x the item id in the event props).
  *
  * Reference-parity params (COMP5349_2.py:202-204): rank=10, seed=0,
  * maxIter=5, regParam=0.1, implicitPrefs, alpha=1.0, top-5 recs.
  *
  * Divergences (SURVEY §7.5):
  *  - the reference murmur-hashes 64-bit ids into ALS's int id space
  *    (f.hash, COMP5349_2.py:197) and reverses the hash with per-row
  *    linear scans (COMP5349_2.py:79-99). Our ids fit int32, so they map
  *    by cast; [[murmurIds]] reproduces the reference's exact hashed ids
  *    (same Catalyst Murmur3Hash, seed 42) for parity tests, and the
  *    reversal is a broadcast equi-join, not a scan.
  *  - users with <5 recommendations keep their partial lists (the
  *    reference silently drops them, reformat_values_w2,
  *    COMP5349_2.py:65-74).
  */
object MentionRecommender {

  /** The reference's exact W2 rating-matrix build on the tweet data
    * model (COMP5349_2.py:196-197): explode user_mentions (null/empty
    * arrays drop, G1), extract the mention struct's id (P4), drop null
    * users (P2), count (user, mention) pairs (A2). */
  def interactionsFromTweets(tweets: DataFrame): DataFrame =
    tweets
      .select(col("user_id"), explode(col("user_mentions")).as("mention"))
      .filter(col("user_id").isNotNull)
      .withColumn("mention_id", col("mention").getField("id"))
      .groupBy(col("user_id"), col("mention_id"))
      .agg(count(lit(1)).as("y"))

  /** Interaction counts: (user, item, y) — the rating-matrix build of
    * COMP5349_2.py:196-197 (explode + filter + groupBy().count()). */
  def interactions(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("user_id").isNotNull && col("item").isNotNull)
      .groupBy(col("user_id"), col("item"))
      .agg(count(lit(1)).as("y"))

  /** Reference-bit-identical hashed ids (F3: Murmur3_x86_32, seed 42 —
    * the same Catalyst expression the reference calls via f.hash). */
  def murmurIds(inter: DataFrame): DataFrame =
    inter
      .withColumn("hash_user_id", hash(col("user_id")))
      .withColumn("hash_item_id", hash(col("item")))

  /** Fit ALS and emit top-k recommendations per user, exploded to rows
    * (user_id, rn, item, rating). Deterministic given the seed and a
    * pinned shuffle-partition count (SURVEY §5.3). */
  def recommend(events: DataFrame, k: Int = 5): DataFrame = {
    val inter = interactions(events)
      .select(col("user_id").cast("int").as("user"), col("item"), col("y").cast("float"))
    val als = new ALS()
      .setRank(10).setSeed(0L).setMaxIter(5).setRegParam(0.1)
      .setImplicitPrefs(true).setAlpha(1.0)
      .setUserCol("user").setItemCol("item").setRatingCol("y")
    val model = als.fit(inter)
    model.setColdStartStrategy("drop")
    val users = inter.select(col("user")).distinct()
    model.recommendForUserSubset(users, k)
      .select(col("user").as("user_id"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"), (col("pos") + 1).as("rn"),
        col("rec.item").as("item"), round(col("rec.rating"), 4).as("rating"))
      .orderBy(col("user_id"), col("rn"))
  }
}
