package graft

import org.apache.spark.sql.functions._
import graft.pipelines.MentionRecommender
import graft.queries.Tables

/** The W2 hash-id path: murmur collisions exist (32-bit hash over 64-bit
  * ids — FIXTURES §4 calls for pinning the divergence), first-match-wins
  * reproduces the reference's loop-with-break, exact mode fans out; plus
  * the full hashed-ids ALS round trip. */
class HashReversalSpec extends SparkSpec {
  import spark.implicits._

  test("reverseHash: first-match-wins vs exact-join on a real murmur collision") {
    // deterministic collision hunt. Sequential ids DON'T collide:
    // murmur3 over a long with constant upper word is a bijection of the
    // lower word (every mixing step is 32-bit invertible) — which is why
    // the reference got away with hashing (COMP5349_2.py:197). Spread
    // ids across both words (safe non-overflowing multiplier) and ~35
    // birthday collisions appear in 500k.
    val ids = spark.range(0, 500000)
      .select(($"id" * lit(6949402657L)).as("id"))
      .select($"id", hash($"id").as("h"))
    val coll = ids.groupBy($"h")
      .agg(count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"))
      .filter($"n" >= 2).orderBy($"h").limit(1)
      .as[(Int, Long, Long, Long)].collect()
    assert(coll.nonEmpty, "no murmur collision in the 500k spread-id set — unexpected")
    val (h, _, lo, hi) = coll.head
    assert(lo != hi)

    val recs = Seq(Tuple1(h)).toDF("hash_id")
    val idMap = Seq(lo, hi).toDF("orig_id").select(hash($"orig_id").as("hm"), $"orig_id")

    val first = MentionRecommender.reverseHash(recs, "hash_id", idMap, "hm", "orig_id",
      firstMatchWins = true).select($"orig_id").as[Long].collect().toSeq
    assert(first == Seq(lo)) // reference semantics: one row, smallest id

    val exact = MentionRecommender.reverseHash(recs, "hash_id", idMap, "hm", "orig_id",
      firstMatchWins = false).select($"orig_id").as[Long].collect().sorted.toSeq
    assert(exact == Seq(lo, hi)) // honest semantics: collision fans out
  }

  test("W2 hashed-ids round trip: recs land on original id domains") {
    val inter = MentionRecommender.interactions(Tables(spark, sf, "events"))
    val users = inter.select($"user_id").distinct().as[Long].collect().toSet
    val items = inter.select($"item").distinct().as[Int].collect().toSet
    val recs = MentionRecommender.recommendHashedIds(inter, k = 5)
      .as[(Long, Int, Int)].collect()
    assert(recs.nonEmpty)
    assert(recs.forall { case (u, rn, it) =>
      users.contains(u) && rn >= 1 && rn <= 5 && items.contains(it)
    })
    // dropPartial (reference parity for reformat_values_w2) only shrinks
    val partial = MentionRecommender.recommendHashedIds(inter, k = 5, dropPartial = true)
      .as[(Long, Int, Int)].collect()
    assert(partial.length <= recs.length)
    // re-assembled reference output shape: (user, [items] in rank order)
    val assembled = MentionRecommender.assembleRecs(
      MentionRecommender.recommendHashedIds(inter, k = 5)
        .withColumnRenamed("rec_item", "item"))
      .as[(Long, Seq[Int])].collect().toMap
    val expected = recs.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(assembled == expected)
  }
}
