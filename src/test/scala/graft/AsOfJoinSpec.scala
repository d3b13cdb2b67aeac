package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The custom as-of operator: micro golden cases (matches, no-match
  * nulls, latest-wins, exact-time inclusivity) plus agreement with the
  * window formulation (q18) on real data. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: latest right <= left time per key; null when none") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))
    ).toDF("id", "key", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (10L, ts("2024-01-01 13:00:00"), 3.0), // after every trade
      (20L, ts("2024-01-01 09:00:00"), 4.0)  // exact-time match included
    ).toDF("qkey", "qt", "price")

    val out = AsOfJoin.asOf(trades, quotes, "key", "qkey", "t", "qt")
      .select($"id", $"price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out(1L) == Some(1.0)) // 09:30 quote
    assert(out(2L) == Some(2.0)) // 11:00 latest <= 12:00
    assert(out(3L) == Some(4.0)) // equal timestamps included
    assert(out(4L) == None)      // key 30 has no quotes -> nulls
  }

  test("asOfKeys: composite keys scope the match (pandas by=[...])") {
    // same venue-less key would cross-match; the (key, venue) composite
    // must keep venues apart — including a venue that exists only on one
    // side (null result, not a cross-venue leak)
    val trades = Seq(
      (1L, 10L, "A", ts("2024-01-01 10:00:00")),
      (2L, 10L, "B", ts("2024-01-01 10:00:00")),
      (3L, 10L, "C", ts("2024-01-01 10:00:00"))
    ).toDF("id", "key", "venue", "t")
    val quotes = Seq(
      (10L, "A", ts("2024-01-01 09:00:00"), 1.0),
      (10L, "A", ts("2024-01-01 09:45:00"), 1.5),
      (10L, "B", ts("2024-01-01 09:30:00"), 2.0)
    ).toDF("qkey", "qvenue", "qt", "price")
    val out = AsOfJoin.asOfKeys(trades, quotes,
        Seq("key", "venue"), Seq("qkey", "qvenue"), "t", "qt")
      .select($"id", $"price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.5)) // latest A quote, not B's
    assert(out(2L) == Some(2.0))
    assert(out(3L) == None)      // venue C: no quotes, null not A/B leak
    // agreement with the single-key form on a synthesized composite col
    val single = AsOfJoin.asOf(
      trades.withColumn("ck", concat_ws("|", $"key", $"venue")),
      quotes.withColumn("qck", concat_ws("|", $"qkey", $"qvenue")),
      "ck", "qck", "t", "qt")
      .select($"id", $"price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == single)
    // arity mismatch is rejected at construction
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfKeys(trades, quotes, Seq("key", "venue"), Seq("qkey"), "t", "qt")
    }
  }

  test("asOf tolerance: stale matches null out, fresh ones survive") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // quote 09:30 -> 30 min old: fresh
      (2L, 10L, ts("2024-01-01 12:00:00")), // quote 11:00 -> 60 min old: at bound
      (3L, 20L, ts("2024-01-01 18:00:00"))  // quote 09:00 -> 9 h old: stale
    ).toDF("id", "key", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (20L, ts("2024-01-01 09:00:00"), 4.0)
    ).toDF("qkey", "qt", "price")
    val hour = 3600L * 1000000
    val out = AsOfJoin.asOf(trades, quotes, "key", "qkey", "t", "qt",
        toleranceMicros = Some(hour))
      .select($"id", $"price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == Some(2.0)) // exactly at the bound: inclusive
    assert(out(3L) == None)      // match exists but is stale -> null-extended
  }

  test("asOf forward: earliest right >= left time; shared match; look-ahead tolerance") {
    val signups = Seq(
      (1L, 10L, ts("2024-01-01 09:00:00")), // next purchase 09:30
      (2L, 10L, ts("2024-01-01 09:10:00")), // SAME next purchase 09:30 (not consumed)
      (3L, 10L, ts("2024-01-01 11:00:00")), // exact-time match 11:00 included
      (4L, 10L, ts("2024-01-01 12:00:00")), // nothing after -> null
      (5L, 20L, ts("2024-01-01 09:00:00"))  // key 20 has no purchases -> null
    ).toDF("id", "key", "t")
    val purchases = Seq(
      (10L, ts("2024-01-01 08:00:00"), 0.5), // before everything: skipped
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0)
    ).toDF("pkey", "pt", "amount")
    val out = AsOfJoin.asOf(signups, purchases, "key", "pkey", "t", "pt",
        forward = true)
      .select($"id", $"amount")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == Some(1.0)) // one purchase serves two signups
    assert(out(3L) == Some(2.0)) // rightTime == leftTime is a match
    assert(out(4L) == None)
    assert(out(5L) == None)

    val halfHour = 1800L * 1000000
    val bounded = AsOfJoin.asOf(signups, purchases, "key", "pkey", "t", "pt",
        toleranceMicros = Some(halfHour), forward = true)
      .select($"id", $"amount")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bounded(1L) == Some(1.0)) // 30 min ahead: at bound, inclusive
    assert(bounded(2L) == Some(1.0)) // 20 min ahead
    assert(bounded(5L) == None)
  }

  test("asOf forward agrees with the min-over-later-rows formulation on events") {
    val ev = graft.queries.Tables(spark, sf, "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val viaOp = AsOfJoin.asOf(signups, purchases, "user_id", "p_user", "ts", "p_ts",
        forward = true)
      .select($"event_id", $"p_ts")
      .as[(Long, Option[Timestamp])].collect().toMap
    val viaJoin = signups.join(purchases,
        $"user_id" === $"p_user" && $"p_ts" >= $"ts", "left")
      .groupBy($"event_id").agg(min($"p_ts").as("p_ts"))
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(viaOp.nonEmpty && viaOp == viaJoin)
    assert(viaOp.values.exists(_.isDefined))
  }

  test("asOf nearest: closer side wins, ties go backward, tolerance bounds both") {
    val signups = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 09:00 (60m) vs fwd 10:30 (30m) -> fwd
      (2L, 10L, ts("2024-01-01 11:30:00")), // back 10:30 (60m) vs fwd 12:30 (60m) -> tie -> back
      (3L, 10L, ts("2024-01-01 23:00:00")), // only back (12:30, 10.5 h)
      (4L, 20L, ts("2024-01-01 10:00:00"))  // no purchases on key -> null
    ).toDF("id", "key", "t")
    val purchases = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0),
      (10L, ts("2024-01-01 10:30:00"), 2.0),
      (10L, ts("2024-01-01 12:30:00"), 3.0)
    ).toDF("pkey", "pt", "amount")
    val out = AsOfJoin.asOfNearest(signups, purchases, "key", "pkey", "t", "pt")
      .select($"id", $"amount")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(2.0))
    assert(out(2L) == Some(2.0)) // equal deltas -> backward (10:30)
    assert(out(3L) == Some(3.0))
    assert(out(4L) == None)

    val hour = 3600L * 1000000
    val bounded = AsOfJoin.asOfNearest(signups, purchases, "key", "pkey", "t", "pt",
        toleranceMicros = Some(hour))
      .select($"id", $"amount")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bounded(1L) == Some(2.0))
    assert(bounded(2L) == Some(2.0)) // both at the bound: inclusive, tie backward
    assert(bounded(3L) == None)      // nearest exists but outside the window
  }

  test("PushFilterThroughAsOfJoin pushes left-only predicates below the join") {
    val trades = Seq((1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 20L, ts("2024-01-01 11:00:00"))).toDF("id", "key", "t")
    val quotes = Seq((10L, ts("2024-01-01 09:00:00"), 1.0))
      .toDF("qkey", "qt", "price")
    val joined = AsOfJoin.asOf(trades, quotes, "key", "qkey", "t", "qt")
    val filtered = joined.filter($"id" === 1L && $"price" > 0.5)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // left-only conjunct (id = 1) sits BELOW the as-of join after the
    // rule fires; the right-referencing conjunct (price) stays above
    val lines = optimized.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("AsOfJoinPlan"))
    assert(joinIdx >= 0, optimized)
    assert(lines.take(joinIdx).exists(_.contains("price")), optimized)
    assert(lines.drop(joinIdx + 1).exists(l => l.contains("Filter") && l.contains("id")), optimized)
    // and semantics hold
    val rows = filtered.select($"id", $"price").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 1.0)))
  }

  test("asOf agrees with the window formulation on events (q25 vs q18)") {
    val viaCustom = SparkEntry.queries("q25_asof_join_custom")(spark, sf)
      .as[(Long, Long, String, Option[String])].collect().toSeq
    val viaWindow = SparkEntry.queries("q18_asof_last_signup")(spark, sf)
      .as[(Long, Long, String, Option[String])].collect().toSeq
    assert(viaCustom.nonEmpty)
    assert(viaCustom == viaWindow)
  }
}
