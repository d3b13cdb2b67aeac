package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.GroupTopK

/** The bounded-heap top-k Aggregator must agree exactly with the window
  * formulation (q04) — same rows, same tie order — and its merge must be
  * order-insensitive (the algebraic property map-side combine relies on). */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("q105 aggregator == q04 window on the orders fixture") {
    val viaWindow = SparkEntry.queries("q04_window_topk")(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val viaAgg = SparkEntry.queries("q105_topk_aggregator")(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(viaAgg.nonEmpty)
    assert(viaAgg == viaWindow)
  }

  test("ties break id-DESC like the reference tuple sort") {
    val rows = Seq((1L, 5.0, 10L), (1L, 5.0, 30L), (1L, 5.0, 20L), (1L, 7.0, 1L))
      .toDF("k", "score", "id").as[(Long, Double, Long)]
    val got = rows.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new GroupTopK[Long](3).toColumn.name("top"))
      .collect().head._2.toSeq
    assert(got == Seq((7.0, 1L), (5.0, 30L), (5.0, 20L)))
  }

  test("reduce/merge: any partitioning of the input yields the same top-k") {
    val agg = new GroupTopK[Long](4)
    val data = Gen.listOf(Gen.zip(Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(0L, 50L)))
    (0 until 60).foreach { seed =>
      val xs = data.apply(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil).distinct
      val nSplits = 1 + seed % 7
      val expected = xs.sortBy { case (s, id) => (-s, -id) }.take(4)
      // fold each slice separately, then merge in slice order
      val slices = xs.grouped(math.max(1, (xs.size + nSplits - 1) / nSplits)).toSeq
      val partials = slices.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq == expected, s"seed=$seed")
    }
  }

  test("NaN scores rank first (Spark DESC placement) in any merge order") {
    // NaN beats every finite score and ties among NaNs break on id —
    // Double.compare total order; -0.0 ties with 0.0 (id decides)
    val agg = new GroupTopK[Long](3)
    val xs = Seq((Double.NaN, 2L), (5.0, 9L), (-0.0, 4L), (0.0, 3L), (Double.NaN, 7L))
    for (perm <- xs.permutations.take(24)) {
      val (l, r) = perm.splitAt(2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val got = agg.finish(merged).toSeq
      assert(got.map(_._2) == Seq(7L, 2L, 9L), s"perm=$perm got=$got")
    }
  }

  test("generic payload: string ids with an ASC tie ordering") {
    // supplier names per nation, ties alphabetical-first => reverse
    // ordering (beats = larger-under-ordering = earlier name)
    implicit val asc: Ordering[String] = Ordering.String.reverse
    val rows = Seq((1L, 3.0, "bbb"), (1L, 3.0, "aaa"), (1L, 9.0, "zzz"), (1L, 1.0, "mmm"))
      .toDF("k", "score", "name").as[(Long, Double, String)]
    val got = rows.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new GroupTopK[String](3).toColumn.name("top"))
      .collect().head._2.toSeq
    assert(got == Seq((9.0, "zzz"), (3.0, "aaa"), (3.0, "bbb")))
  }

  test("physical plan is ObjectHashAggregate with a partial stage, no Window") {
    // AdaptiveSparkPlanExec is a leaf wrapper (collect can't see through
    // it) — assert on the initial physical plan it wraps
    val plan = SparkEntry.queries("q105_topk_aggregator")(spark, sf)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val windows = plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "aggregator form must not plan a Window")
    val objAgg = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAgg.size >= 2, s"expected partial+final ObjectHashAggregate, got ${objAgg.size}")
  }
}
