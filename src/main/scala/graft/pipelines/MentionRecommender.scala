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
      .select(col("user_id"), graft.queries.Tables.propsItem.as("item"))
      .filter(col("user_id").isNotNull && col("item").isNotNull)
      .groupBy(col("user_id"), col("item"))
      .agg(count(lit(1)).as("y"))

  /** Reference-bit-identical hashed ids (F3: Murmur3_x86_32, seed 42 —
    * the same Catalyst expression the reference calls via f.hash). */
  def murmurIds(inter: DataFrame): DataFrame =
    inter
      .withColumn("hash_user_id", hash(col("user_id")))
      .withColumn("hash_item_id", hash(col("item")))

  /** J2/J3/R8: reverse hashed ids back to originals via broadcast
    * equi-joins — the replacement for the reference's per-row linear
    * scans over a driver-collected list (convert_user/convert_mention,
    * COMP5349_2.py:79-99).
    *
    * `firstMatchWins = true` reproduces the reference's collision
    * behavior exactly (its Python loop breaks on the first list entry
    * with a matching hash): the build side keeps only the smallest
    * original id per hash. With `false`, collisions fan out to all
    * preimages (the honest relational semantics; SURVEY §7.5.1 — at
    * scale the real fix is a dense-rank id dictionary, not a hash).
    */
  def reverseHash(recs: DataFrame, hashCol: String, idMap: DataFrame,
      mapHashCol: String, mapIdCol: String,
      firstMatchWins: Boolean = true): DataFrame = {
    val build0 = idMap.select(col(mapHashCol), col(mapIdCol))
    val build =
      if (firstMatchWins)
        build0.groupBy(col(mapHashCol)).agg(min(col(mapIdCol)).as(mapIdCol))
      else build0.distinct()
    recs.join(broadcast(build), recs(hashCol) === build(mapHashCol), "left")
      .drop(mapHashCol)
  }

  /** The reference's full W2 id path (COMP5349_2.py:197-211): murmur-hash
    * the 64-bit ids into ALS's int space, fit + recommend on hashed ids,
    * then reverse both sides through broadcast joins. `dropPartial`
    * mirrors reformat_values_w2 (COMP5349_2.py:65-74), which silently
    * drops users with fewer than k recommendations; default keeps them
    * (divergence flag 3, SURVEY §7.5). */
  def recommendHashedIds(inter: DataFrame, k: Int = 5,
      dropPartial: Boolean = false, numBlocks: Int = 0): DataFrame = {
    val hashed = murmurIds(inter)
    val als = new ALS()
      .setRank(10).setSeed(0L).setMaxIter(5).setRegParam(0.1)
      .setImplicitPrefs(true).setAlpha(1.0)
      .setUserCol("hash_user_id").setItemCol("hash_item_id").setRatingCol("y")
    if (numBlocks > 0) als.setNumBlocks(numBlocks)
    val model = als.fit(hashed.select(col("hash_user_id"), col("hash_item_id"),
      col("y").cast("float").as("y")))
    model.setColdStartStrategy("drop")
    val users = hashed.select(col("hash_user_id")).distinct()
    val recs0 = model.recommendForUserSubset(users, k)
    val recs = if (dropPartial) recs0.filter(size(col("recommendations")) === k) else recs0
    val exploded = recs
      .select(col("hash_user_id"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("hash_user_id"), (col("pos") + 1).as("rn"),
        col("rec.hash_item_id").as("rec_hash_item"))
    val userMap = hashed.select(col("hash_user_id"), col("user_id")).distinct()
    val itemMap = hashed.select(col("hash_item_id"), col("item")).distinct()
    val withUser = reverseHash(exploded, "hash_user_id", userMap, "hash_user_id", "user_id")
    reverseHash(withUser, "rec_hash_item", itemMap, "hash_item_id", "item")
      .select(col("user_id"), col("rn"), col("item").as("rec_item"))
  }

  /** Re-assemble exploded (user_id, rn, item...) recommendation rows
    * into the reference's output shape (user, [k item ids] in rank
    * order — reformat_values_w2's tuple, COMP5349_2.py:65-74): sort the
    * collected (rn, item) structs, then project the items. Rank order is
    * carried by the struct sort, not by collect_list's arrival order
    * (which is partition-dependent, SURVEY §5.3). */
  def assembleRecs(recRows: DataFrame, itemCol: String = "item"): DataFrame =
    recRows
      .groupBy(col("user_id"))
      .agg(expr(s"transform(array_sort(collect_list(struct(rn, $itemCol))), x -> x.$itemCol)")
        .as("recommendations"))

  /** Fit ALS and emit top-k recommendations per user, exploded to rows
    * (user_id, rn, item, rating). Deterministic given the seed and a
    * pinned shuffle-partition count (SURVEY §5.3).
    *
    * `numBlocks <= 0` keeps Spark's own default (10x10 blocks = 100
    * factor-join tasks per sweep) — the right setting on a real cluster,
    * where block count should track parallelism, not be pinned to a
    * local constant. The local bench entry (q53) passes 4: same math,
    * far fewer stages on a single machine. */
  def recommend(events: DataFrame, k: Int = 5, numBlocks: Int = 0): DataFrame = {
    val (model, inter) = fitModel(events, numBlocks)
    val users = inter.select(col("user")).distinct()
    model.recommendForUserSubset(users, k)
      .select(col("user").as("user_id"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"), (col("pos") + 1).as("rn"),
        col("rec.item").as("item"), round(col("rec.rating"), 4).as("rating"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** The item-side mirror of [[recommend]] — `recommendForItemSubset`:
    * for each observed item, the top-k USERS most likely to engage with
    * it (the "who do we show this item to" face the reference leaves on
    * the table: COMP5349_2.py:206-208 calls only the user side, but the
    * fitted model carries both factor matrices). Same fit, same seed —
    * one model answers both directions; output exploded to
    * (item, rn, user_id, rating) rows with the same rank/rounding
    * conventions as the user side. */
  def recommendItems(events: DataFrame, k: Int = 5, numBlocks: Int = 0): DataFrame = {
    val (model, inter) = fitModel(events, numBlocks)
    val items = inter.select(col("item")).distinct()
    model.recommendForItemSubset(items, k)
      .select(col("item"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("item"), (col("pos") + 1).as("rn"),
        col("rec.user").as("user_id"), round(col("rec.rating"), 4).as("rating"))
      .orderBy(col("item"), col("rn"))
  }

  /** Shared W2 fit: interactions → seeded implicit ALS (reference
    * params), coldStart=drop. Returns the model plus the (user, item, y)
    * frame it was fitted on so callers can derive the query subsets. */
  private def fitModel(events: DataFrame, numBlocks: Int)
      : (org.apache.spark.ml.recommendation.ALSModel, DataFrame) = {
    // materialized ONCE (r22): the fit consumes this frame and the
    // caller's recommend-subset distinct re-reads it — left lazy, the
    // subset recomputed the whole events scan + interaction aggregate a
    // second time (a full corpus pass at scale). Eager localCheckpoint,
    // not cache: truthful AQE sizing (the q36 rule) and same rows/
    // partitioning as the plan it truncates, so the seeded fit is
    // unchanged.
    val inter = interactions(events)
      .select(col("user_id").cast("int").as("user"), col("item"), col("y").cast("float"))
      .localCheckpoint(true)
    val als = new ALS()
      .setRank(10).setSeed(0L).setMaxIter(5).setRegParam(0.1)
      .setImplicitPrefs(true).setAlpha(1.0)
      .setUserCol("user").setItemCol("item").setRatingCol("y")
    if (numBlocks > 0) als.setNumBlocks(numBlocks)
    val model = als.fit(inter)
    model.setColdStartStrategy("drop")
    (model, inter)
  }
}
