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
