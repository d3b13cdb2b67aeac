package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipelines.{MentionRecommender, UserSimilarity}

/** End-to-end parity on the reference's own data model: a multiline
  * tweets.json (the reference input shape, COMP5349_2.py:138) through the
  * exact W1/W2 relational cores. Fixture rows cover every case FIXTURES.md
  * §1 calls for: reply-only, retweet-only, neither, null user_id,
  * null/empty user_mentions, repeated (user, mention) pairs, >2^31 ids. */
class TweetParitySpec extends SparkSpec {
  import spark.implicits._

  private val tweetSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("replyto_id", LongType),
    StructField("retweet_id", LongType),
    StructField("user_mentions", ArrayType(StructType(Seq(
      StructField("id", LongType)))))))

  // ids beyond Int32 (1016523579205222401 appears in the reference's
  // golden output, kdan9405_Assignment2_Notebook:221)
  private val tweetsJson =
    """[
      |  {"user_id": 1, "replyto_id": 100, "user_mentions": [{"id": 1016523579205222401}, {"id": 7}]},
      |  {"user_id": 1, "retweet_id": 200, "user_mentions": [{"id": 7}]},
      |  {"user_id": 2, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 2, "retweet_id": 200, "user_mentions": null},
      |  {"user_id": 3, "retweet_id": 300},
      |  {"user_id": 4, "user_mentions": [{"id": 7}]},
      |  {"user_id": null, "replyto_id": 100, "user_mentions": [{"id": 8}]}
      |]""".stripMargin

  private lazy val jsonPath: Path = {
    val dir = Files.createTempDirectory("tweets")
    val f = dir.resolve("tweets.json")
    Files.writeString(f, tweetsJson)
    f
  }

  private def readTweets(explicitSchema: Boolean): DataFrame = {
    val r = spark.read.option("multiline", "true")
    (if (explicitSchema) r.schema(tweetSchema) else r).json(jsonPath.toString)
  }

  test("S1: multiline JSON source — inference and explicit schema agree") {
    val inferred = readTweets(explicitSchema = false)
    val explicit = readTweets(explicitSchema = true)
    assert(inferred.count() == 7 && explicit.count() == 7)
    // inference finds the nested array<struct<id:long>> shape
    val mentionsType = inferred.schema("user_mentions").dataType
    assert(mentionsType.isInstanceOf[ArrayType])
  }

  test("W1 core: filter OR-null, concat_ws null-skip, per-user docs") {
    // user 4 has neither reply nor retweet -> dropped (P1); concat_ws
    // skips the null side so ids are bare (F1); the null-user row IS kept
    // by W1 (the reference only null-filters in W2, COMP5349_2.py:196) —
    // so collect via Row, not a non-nullable Long encoder.
    val docs = UserSimilarity.tweetDocs(readTweets(explicitSchema = true))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1))).toSeq
    assert(docs.exists(_._1.isEmpty)) // the null-user group survives W1
    // collect_list order is partition-dependent (SURVEY §5.3) — compare
    // id multisets, not the joined string
    val byUser = docs.collect { case (Some(u), ids) => u -> ids.split(", ").sorted.toSeq }.toMap
    assert(byUser(1L) == Seq("100", "200"))
    assert(byUser(2L) == Seq("100", "200"))
    assert(byUser(3L) == Seq("300"))
    assert(!byUser.contains(4L))
  }

  test("W1 e2e on tweets: identical docs tie, ordered id DESC (T1)") {
    val docs = UserSimilarity.tweetDocs(readTweets(explicitSchema = true))
      .filter($"user_id".isNotNull)
    val feats = UserSimilarity.featurize(docs, UserSimilarity.Params(parityTokens = true))
    val top = UserSimilarity.topKSimilar(feats, col("user_id") === 1L, "tfidf_norm", k = 2)
      .orderBy($"rn").select($"other_user", $"sim_r").as[(Long, Double)].collect()
    // users 1 and 2 have identical documents -> sim 1.0 first; user 3
    // shares no terms -> sim 0
    assert(top.head == ((2L, 1.0)))
  }

  test("W2 core: explode drops null/empty mentions, counts repeats (G1/A2)") {
    val inter = MentionRecommender.interactionsFromTweets(readTweets(explicitSchema = true))
      .orderBy($"user_id", $"mention_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(inter == Seq(
      (1L, 7L, 2L), // repeated mention counted
      (1L, 1016523579205222401L, 1L), // >2^31 id survives
      (4L, 7L, 1L)))
    // rows with null/empty user_mentions and the null-user row are gone
  }

  // The reference's only captured correctness artifact is the W1 top-5
  // list with tied scores broken id-DESC (kdan9405_Assignment2_Notebook:
  // 220-230). This fixture reproduces that golden *shape*: users 2-4
  // carry documents identical to the query user (sim 1.0 three-way tie)
  // and users 5-6 carry a second identical pair (equal partial overlap),
  // so the full ordered 5-list pins both tie groups id-DESC.
  private val goldenTieJson =
    """[
      |  {"user_id": 1, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 1, "retweet_id": 200, "user_mentions": []},
      |  {"user_id": 2, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 2, "retweet_id": 200, "user_mentions": []},
      |  {"user_id": 3, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 3, "retweet_id": 200, "user_mentions": []},
      |  {"user_id": 4, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 4, "retweet_id": 200, "user_mentions": []},
      |  {"user_id": 5, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 5, "retweet_id": 300, "user_mentions": []},
      |  {"user_id": 6, "replyto_id": 100, "user_mentions": []},
      |  {"user_id": 6, "retweet_id": 300, "user_mentions": []},
      |  {"user_id": 7, "replyto_id": 400, "user_mentions": []}
      |]""".stripMargin

  test("golden-tie fixture: literal W1 top-5, ties id-DESC, both spaces") {
    val dir = Files.createTempDirectory("tweets-golden")
    Files.writeString(dir.resolve("tweets.json"), goldenTieJson)
    val tweets = spark.read.option("multiline", "true")
      .schema(tweetSchema).json(dir.toString)
    val feats = UserSimilarity.featurize(
      UserSimilarity.tweetDocs(tweets),
      UserSimilarity.Params(parityTokens = true))
    for (space <- Seq("tfidf_norm", "cv_norm")) {
      val top = UserSimilarity.topKSimilar(feats, col("user_id") === 1L, space, k = 5)
        .orderBy($"rn").select($"other_user", $"sim_r").as[(Long, Double)]
        .collect().toSeq
      // the golden shape: {2,3,4} tie at 1.0 ordered 4,3,2; {5,6} tie at
      // a strictly smaller sim ordered 6,5
      assert(top.map(_._1) == Seq(4L, 3L, 2L, 6L, 5L), s"order in $space: $top")
      assert(top.take(3).forall(_._2 == 1.0), s"identical-doc ties in $space: $top")
      assert(top(3)._2 == top(4)._2 && top(3)._2 < 1.0 && top(3)._2 > 0.0,
        s"partial-overlap tie in $space: $top")
    }
  }

  test("F3: murmur ids compress >2^31 ids into int range (reference W2 hash)") {
    val inter = MentionRecommender.interactionsFromTweets(readTweets(explicitSchema = true))
    val hashed = MentionRecommender.murmurIds(
      inter.withColumnRenamed("mention_id", "item"))
    val cols = hashed.select($"hash_user_id", $"hash_item_id").collect()
    assert(cols.forall(r => r.get(0).isInstanceOf[Int] && r.get(1).isInstanceOf[Int]))
  }
}
