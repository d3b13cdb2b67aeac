package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank golden cases (fixed points and a hand-computed dangling
  * step) plus the mass-conservation invariant on real data. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("cycle is a fixed point: every node keeps rank 1/3") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 3).as[(String, Double)].collect().toMap
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, r.toString))
  }

  test("two-cycle is a fixed point at 1/2") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 4).as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - 0.5) < 1e-12 && math.abs(r("b") - 0.5) < 1e-12)
  }

  test("dangling node redistributes: one hand-computed iteration") {
    // a -> b, b dangling. r0 = (.5, .5); dsum = .5
    // b: .15/2 + .85*(.5 + .25) = .7125 ; a: .075 + .85*.25 = .2875
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(e, iters = 1).as[(String, Double)].collect().toMap
    assert(math.abs(r("b") - 0.7125) < 1e-12, r.toString)
    assert(math.abs(r("a") - 0.2875) < 1e-12, r.toString)
  }

  test("rank mass is conserved on the real mention graph") {
    val inter = graft.pipelines.MentionRecommender.interactions(
      graft.queries.Tables(spark, sf, "events"))
    val e = inter.select(concat(lit("u:"), col("user_id")).as("src"),
      concat(lit("i:"), col("item")).as("dst"))
    val ranks = Graph.pageRank(e, iters = 3)
    val total = ranks.agg(sum(col("rank"))).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
    // ranks positive, teleport floor respected
    val n = ranks.count().toDouble
    val bad = ranks.filter(col("rank") < (1.0 - 0.85) / n - 1e-12)
    assert(bad.isEmpty)
  }
}
