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
      .agg(new GroupTopK(3).toColumn.name("top"))
      .collect().head._2.toSeq
    assert(got == Seq((7.0, 1L), (5.0, 30L), (5.0, 20L)))
  }

  test("reduce/merge: any partitioning of the input yields the same top-k") {
    val agg = new GroupTopK(4)
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
