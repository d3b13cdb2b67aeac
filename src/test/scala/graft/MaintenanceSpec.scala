package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{FuzzyJoin, Incremental, Resample}

/** Value specs for the round-14 maintenance/linkage operators:
  * incremental aggregate upkeep, time-grid forward fill, blocked fuzzy
  * matching. Each pins the semantic claim its query's oracle can only
  * check end-to-end. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Incremental -------------------------------------------------

  private val rows = Seq(
    ("a", Some(1.0)), ("a", Some(5.0)), ("a", None),
    ("b", Some(-2.0)), ("b", Some(4.0)),
    ("c", None)) // all-null key: cnt 0, mean null

  test("Incremental: merged batch states == single full aggregation") {
    val df = rows.toDF("k", "v")
    val full = Incremental.finish(
      Incremental.merge(Seq(Incremental.partial(df, $"k", $"v"))))
    // three arbitrary batches, merged
    val batches = Seq(
      df.filter(crc32($"k".cast("string")) % 3 === 0),
      df.filter(crc32($"k".cast("string")) % 3 === 1),
      df.filter(crc32($"k".cast("string")) % 3 === 2))
      .map(Incremental.partial(_, $"k", $"v"))
    val inc = Incremental.finish(Incremental.merge(batches))
    val a = full.orderBy("key").collect().toSeq
    val b = inc.orderBy("key").collect().toSeq
    assert(a == b)
  }

  test("Incremental: merge is associative — regrouping batches keeps the state") {
    val df = rows.toDF("k", "v")
    val p = (0 to 2).map(i => Incremental.partial(
      df.filter(crc32($"k".cast("string")) % 3 === i), $"k", $"v"))
    val flat = Incremental.merge(p)
    val nested = Incremental.merge(Seq(Incremental.merge(p.take(2)), p(2)))
    assert(flat.orderBy("key").collect().toSeq ==
      nested.orderBy("key").collect().toSeq)
  }

  test("Incremental: null-only key has cnt 0 and null mean, min/max null") {
    val out = Incremental.finish(Incremental.merge(Seq(
      Incremental.partial(rows.toDF("k", "v"), $"k", $"v"))))
      .filter($"key" === "c").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("cnt") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean")))
    assert(r.isNullAt(r.fieldIndex("vmin")) && r.isNullAt(r.fieldIndex("vmax")))
  }

  test("Incremental delta: cnt/sum/mean exact under retraction; needs_rebuild iff a bound is hit") {
    val ins = Seq(("a", 1.0), ("a", 5.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .toDF("k", "v")
    // delete a's INTERIOR 3.0 (bounds untouched) and b's max 4.0
    val del = Seq(("a", 3.0), ("b", 4.0)).toDF("k", "v")
    val out = Incremental.finishDelta(Incremental.mergeDelta(Seq(
        Incremental.partialDelta(ins, $"k", $"v", lit(1L)),
        Incremental.partialDelta(del, $"k", $"v", lit(-1L)))))
      .orderBy("key").collect()
    val a = out(0); val b = out(1)
    assert((a.getAs[Long]("cnt"), a.getAs[Double]("sum"), a.getAs[Double]("mean")) ==
      ((2L, 6.0, 3.0)))
    // interior delete: insert-side bounds are still the true bounds
    assert((a.getAs[Double]("vmin"), a.getAs[Double]("vmax"),
      a.getAs[Boolean]("needs_rebuild")) == ((1.0, 5.0, false)))
    assert((b.getAs[Long]("cnt"), b.getAs[Double]("sum"), b.getAs[Double]("mean")) ==
      ((1L, 2.0, 2.0)))
    // b's max was retracted: the stored bound is stale and SAYS so
    assert(b.getAs[Boolean]("needs_rebuild"))
  }

  test("Incremental delta: retraction to empty leaves cnt 0, null mean; batch grouping irrelevant") {
    val ins = Seq(("a", 2.0), ("b", 7.0)).toDF("k", "v")
    val del = Seq(("a", 2.0)).toDF("k", "v")
    val p = Seq(Incremental.partialDelta(ins, $"k", $"v", lit(1L)),
      Incremental.partialDelta(del, $"k", $"v", lit(-1L)))
    val flat = Incremental.finishDelta(Incremental.mergeDelta(p))
    val nested = Incremental.finishDelta(
      Incremental.mergeDelta(Seq(Incremental.mergeDelta(p.take(1)), p(1))))
    assert(flat.orderBy("key").collect().toSeq ==
      nested.orderBy("key").collect().toSeq)
    val a = flat.filter($"key" === "a").collect().head
    assert(a.getAs[Long]("cnt") == 0L)
    assert(a.isNullAt(a.fieldIndex("mean")))
    assert(a.getAs[Boolean]("needs_rebuild")) // deleted value == both bounds
  }

  test("Incremental delta with only inserts == the insert-only face") {
    val df = rows.toDF("k", "v")
    val viaDelta = Incremental.finishDelta(Incremental.mergeDelta(Seq(
        Incremental.partialDelta(df, $"k", $"v", lit(1L)))))
      .drop("needs_rebuild")
    val viaInsert = Incremental.finish(
      Incremental.merge(Seq(Incremental.partial(df, $"k", $"v"))))
    assert(viaDelta.orderBy("key").collect().toSeq ==
      viaInsert.orderBy("key").collect().toSeq)
  }

  test("Incremental.rebuildFlagged: repairs exactly the flagged keys, leaves the rest bit-identical") {
    // key a: delete hits the stored max (flagged); key b: interior
    // delete (not flagged); key c: retracted to emptiness (flagged,
    // must repair to NULL bounds, not keep the stale insert-side ones)
    val ins = Seq(("a", 1.0), ("a", 5.0), ("a", 9.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("c", 3.0)).toDF("k", "v")
    val del = Seq(("a", 9.0), ("b", 4.0), ("c", 3.0)).toDF("k", "v")
    val state = Incremental.mergeDelta(Seq(
      Incremental.partialDelta(ins, $"k", $"v", lit(1L)),
      Incremental.partialDelta(del, $"k", $"v", lit(-1L))))
    val flags0 = Incremental.finishDelta(state).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("needs_rebuild")).toMap
    assert(flags0 == Map("a" -> true, "b" -> false, "c" -> true))
    val live = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0), ("b", 6.0)).toDF("k", "v")
    val repaired = Incremental.rebuildFlagged(state, live, $"k", $"v")
    val fin = Incremental.finishDelta(repaired).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(3)), Option(r.get(4)),
          r.getAs[Boolean]("needs_rebuild")))).toMap
    // full-recompute equality on the live rows, no flag anywhere
    assert(fin("a") == ((2L, Some(1.0), Some(5.0), false)))
    assert(fin("b") == ((2L, Some(2.0), Some(6.0), false)))
    assert(fin("c") == ((0L, None, None, false)))
    // the unflagged key's STATE row is untouched — retraction trackers
    // included (the repair is per-flagged-key, not a blanket rewrite)
    assert(repaired.filter($"key" === "b").collect().map(_.toSeq).toSeq ==
      state.filter($"key" === "b").collect().map(_.toSeq).toSeq)
    // repaired keys' trackers are cleared, so the repair is idempotent
    val again = Incremental.rebuildFlagged(repaired, live, $"k", $"v")
    assert(again.orderBy("key").collect().map(_.toSeq).toSeq ==
      repaired.orderBy("key").collect().map(_.toSeq).toSeq)
  }

  test("Incremental.rebuildFlagged: a NULL group key repairs like any other (null-safe joins)") {
    val ins = Seq((None, 1.0), (None, 9.0), (Some("x"), 5.0))
      .toDF("k", "v")
    val del = Seq((Option.empty[String], 9.0)).toDF("k", "v")
    val state = Incremental.mergeDelta(Seq(
      Incremental.partialDelta(ins, $"k", $"v", lit(1L)),
      Incremental.partialDelta(del, $"k", $"v", lit(-1L))))
    val flagged0 = Incremental.finishDelta(state)
      .filter($"needs_rebuild").select($"key").collect()
    assert(flagged0.length == 1 && flagged0.head.isNullAt(0))
    val live = Seq((Option.empty[String], 1.0), (Some("x"), 5.0)).toDF("k", "v")
    val fin = Incremental.finishDelta(
        Incremental.rebuildFlagged(state, live, $"k", $"v")).collect()
      .map(r => Option(r.get(0)) ->
        ((Option(r.get(3)), Option(r.get(4)), r.getAs[Boolean]("needs_rebuild")))).toMap
    assert(fin(None) == ((Some(1.0), Some(1.0), false)))   // repaired, unflagged
    assert(fin(Some("x")) == ((Some(5.0), Some(5.0), false))) // untouched
  }

  // ---- Resample ----------------------------------------------------

  test("Resample.hourlyFfill: complete grid, gaps carry last value, flags exact") {
    val ev = Seq(
      ("k", ts("2024-01-01 00:10:00"), 1.0),
      ("k", ts("2024-01-01 00:40:00"), 2.0),
      // 01:00 and 02:00 silent
      ("k", ts("2024-01-01 03:05:00"), 7.0)
    ).toDF("t", "ts", "value")
    val out = Resample.hourlyFfill(ev, "t", "ts", "value")
      .orderBy("h").collect()
    assert(out.map(_.getAs[Timestamp]("h")) === Array(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"),
      ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00")))
    assert(out.map(_.getAs[Double]("v_ff")).toSeq == Seq(3.0, 3.0, 3.0, 7.0))
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq ==
      Seq(false, true, true, false))
  }

  test("Resample.hourlyFfill: keys fill independently, single-hour key is one row") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 02:00:00"), 5.0),
      ("b", ts("2024-01-01 10:00:00"), 9.0)
    ).toDF("t", "ts", "value")
    val out = Resample.hourlyFfill(ev, "t", "ts", "value")
    assert(out.count() == 4) // a: 3 grid hours, b: 1
    val aGap = out.filter($"t" === "a" && $"is_gap").collect()
    assert(aGap.map(_.getAs[Double]("v_ff")).toSeq == Seq(1.0))
    assert(out.filter($"t" === "b").collect()
      .map(r => (r.getAs[Double]("v_ff"), r.getAs[Boolean]("is_gap"))).toSeq ==
      Seq((9.0, false)))
  }

  // ---- FuzzyJoin ---------------------------------------------------

  test("FuzzyJoin.blockedPairs: within-block results == naive all-pairs within block") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamme"), // dist 1 from doc 1
      (3L, "alpha zeta entirely other"), // same 5-prefix block, far
      (4L, "omega beta gamma") // other block, dist small vs 1 — must be missed
    ).toDF("id", "s")
    val got = FuzzyJoin.blockedPairs(docs, $"id",
        substring($"s", 1, 5), $"s", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1)))
    // the cross-block miss is the documented recall bound: 1-4 differ
    // only in the first word yet are never compared
    val unblocked = FuzzyJoin.blockedPairs(docs, $"id",
        lit(1), $"s", maxDist = 6)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(unblocked.contains((1L, 4L)))
  }

  test("FuzzyJoin.blockedPairs: maxDist boundary inclusive, id order canonical") {
    val docs = Seq((5L, "aaaa"), (2L, "aaab"), (9L, "aabb")).toDF("id", "s")
    val got = FuzzyJoin.blockedPairs(docs, $"id", lit(1), $"s", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((2L, 5L, 1), (2L, 9L, 1)))
  }
}
