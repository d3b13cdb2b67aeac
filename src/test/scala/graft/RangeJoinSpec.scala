package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.RangeJoin

/** The binned keyless interval join must be row-identical to the naive
  * BETWEEN join at every bin width, and its plan must be an equi-join on
  * the bin — never the broadcast-NLJ/cartesian Spark falls back to for a
  * keyless range predicate. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    points.join(intervals, col("p").between(col("lo"), col("hi")))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSeq.sorted

  test("binned == naive BETWEEN join, at several widths, random fixtures") {
    val pGen = Gen.listOfN(120, Gen.zip(Gen.chooseNum(0L, 400L)))
    val iGen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 380L), Gen.chooseNum(0L, 60L)))
    (0 until 10).foreach { seed =>
      val ps = pGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      val ivs = iGen(Gen.Parameters.default, Seed(seed.toLong + 1000)).get
        .zipWithIndex.map { case ((lo, span), i) =>
          // seed a few degenerate cases: empty (hi < lo) intervals must
          // match nothing, single-point (hi == lo) must match exactly
          if (i % 7 == 0) (1000L + i, lo, lo - 1) else (1000L + i, lo, lo + span)
        }
      val points = ps.toDF("pid", "p")
      val intervals = ivs.toDF("iid", "lo", "hi")
      val expected = naive(points, intervals)
      for (w <- Seq(1L, 7L, 64L, 1000L)) {
        val got = RangeJoin.pointInInterval(points, col("p"), intervals,
            col("lo"), col("hi"), binWidth = w)
          .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSeq.sorted
        assert(got == expected, s"seed=$seed width=$w")
      }
    }
  }

  test("each qualifying pair appears exactly once (no bin-overlap dupes)") {
    // one long interval spanning many bins; every contained point must
    // match it exactly once even though the interval explodes onto ~20 bins
    val points = (0L until 200L).map(i => (i, i)).toDF("pid", "p")
    val intervals = Seq((1L, 10L, 190L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, col("p"), intervals,
        col("lo"), col("hi"), binWidth = 10)
      .groupBy(col("pid")).count().filter(col("count") =!= 1)
    assert(got.isEmpty, "a (point, interval) pair matched in more than one bin")
  }

  test("plan is an equi-join on the bin, never NLJ/cartesian") {
    val points = (0L until 1000L).map(i => (i, i % 500)).toDF("pid", "p")
    val intervals = (0L until 50L).map(i => (i, i * 10, i * 10 + 15)).toDF("iid", "lo", "hi")
    val joined = RangeJoin.pointInInterval(points, col("p"), intervals,
      col("lo"), col("hi"), binWidth = 10)
    val plan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val bad = plan.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"keyless range join fell back to ${bad.map(_.nodeName)}")
    // and the naive formulation DOES fall back — the contrast the op exists for
    val naivePlan = points.join(intervals, col("p").between(col("lo"), col("hi")))
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val nlj = naivePlan.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nlj.nonEmpty, "expected the naive keyless range join to plan as NLJ")
  }

  test("intervalOverlap == naive overlap join, several widths, random fixtures") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 300L), Gen.chooseNum(0L, 80L)))
    (0 until 8).foreach { seed =>
      val as = gen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((lo, span), i) =>
          if (i % 9 == 0) (i.toLong, lo, lo - 1) // degenerate: matches nothing
          else (i.toLong, lo, lo + span)
        }
      val bs = gen(Gen.Parameters.default, Seed(seed.toLong + 500)).get
        .zipWithIndex.map { case ((lo, span), i) => (100L + i, lo, lo + span) }
      val a = as.toDF("aid", "alo", "ahi")
      val b = bs.toDF("bid", "blo", "bhi")
      // naive baseline restricted to WELL-FORMED intervals: for an empty
      // [lo, lo-1] the bare predicate can still evaluate true, but the
      // op's contract is SET overlap — empty intervals intersect nothing
      val expected = a.filter(col("alo") <= col("ahi"))
        .join(b.filter(col("blo") <= col("bhi")),
          col("alo") <= col("bhi") && col("blo") <= col("ahi"))
        .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSeq.sorted
      for (w <- Seq(1L, 13L, 100L, 1000L)) {
        val got = RangeJoin.intervalOverlap(a, col("alo"), col("ahi"),
            b, col("blo"), col("bhi"), binWidth = w)
          .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSeq.sorted
        assert(got == expected, s"seed=$seed width=$w")
      }
    }
  }

  test("intervalOverlap: pairs sharing MANY bins still appear exactly once") {
    // two long intervals overlapping across ~20 bins; plain bin-equality
    // joining would emit the pair once per shared bin
    val a = Seq((1L, 0L, 200L)).toDF("aid", "alo", "ahi")
    val b = Seq((2L, 50L, 250L), (3L, 190L, 400L)).toDF("bid", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, col("alo"), col("ahi"),
        b, col("blo"), col("bhi"), binWidth = 10)
      .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 2L), (1L, 3L)))
  }

  test("intervalOverlap rejects overlapping column names up front") {
    // the documented disjointness, now enforced: a forgotten re-alias
    // in a self-join must fail fast, not mis-resolve bound columns
    val a = Seq((1L, 0L, 10L)).toDF("id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, col("lo"), col("hi"),
        a, col("lo"), col("hi"), binWidth = 10)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("binning is exact beyond 2^53 (epoch-nanos magnitudes)") {
    // floor(x / w) through double division mis-bins here: these points
    // differ by 1 at ~2^60, far below double's ULP at that magnitude.
    // The op must still separate in-interval from out-of-interval.
    val base = 1L << 60
    val points = Seq((1L, base), (2L, base + 1), (3L, base - 1), (4L, base + 1000))
      .toDF("pid", "p")
    val intervals = Seq((10L, base, base + 1)).toDF("iid", "lo", "hi")
    // negative domain too: floor-div (not truncation) must bin -1 into
    // the -1 bin so the [-5, -1] interval still meets it
    val negP = Seq((5L, -1L)).toDF("pid", "p")
    val negI = Seq((20L, -5L, -1L)).toDF("iid", "lo", "hi")
    for (w <- Seq(7L, 1000000L)) {
      val got = RangeJoin.pointInInterval(points, col("p"), intervals,
          col("lo"), col("hi"), binWidth = w)
        .select(col("pid")).as[Long].collect().toSeq.sorted
      assert(got == Seq(1L, 2L), s"width=$w")
      val gotNeg = RangeJoin.pointInInterval(negP, col("p"), negI,
          col("lo"), col("hi"), binWidth = w)
        .select(col("pid")).as[Long].collect().toSeq
      assert(gotNeg == Seq(5L), s"neg width=$w")
    }
  }

  test("intervalOverlap also plans an equi-join on the bin, never NLJ") {
    val a = (0L until 300L).map(i => (i, i * 3, i * 3 + 20)).toDF("aid", "alo", "ahi")
    val b = (0L until 300L).map(i => (500 + i, i * 2, i * 2 + 9)).toDF("bid", "blo", "bhi")
    val plan = RangeJoin.intervalOverlap(a, col("alo"), col("ahi"),
        b, col("blo"), col("bhi"), binWidth = 16)
      .queryExecution.executedPlan match {
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => ad.inputPlan
      case p => p
    }
    val bad = plan.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"overlap join fell back to ${bad.map(_.nodeName)}")
  }

  test("working column name dodges existing _bin columns") {
    val points = Seq((1L, 5L, 99L)).toDF("pid", "p", "_bin")
    val intervals = Seq((10L, 0L, 10L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, col("p"), intervals,
      col("lo"), col("hi"), binWidth = 4)
    assert(got.columns.count(_ == "_bin") == 1, "caller's _bin column clobbered")
    assert(got.select(col("_bin")).as[Long].collect().toSeq == Seq(99L))
  }
}
