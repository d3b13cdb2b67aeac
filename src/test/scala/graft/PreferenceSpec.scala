package graft

import org.apache.spark.sql.functions._

/** Golden-case validation of the preference-aggregation ops
  * (graft.ops.Preference) and rank-biased overlap
  * (graft.ops.RankEval.rbo) — closed forms the DuckDB oracle rows
  * (q312/q315/q316) exercise only on fixture-shaped data. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry two-item matrix recovers the closed-form ratio") {
    // two items: the BT MLE is strength_a/strength_b = w_a/w_b exactly,
    // so normalized strengths are 0.7 / 0.3
    val wins = Seq(("a", "b", 7L), ("b", "a", 3L))
      .toDF("winner", "loser", "n")
    val rows = ops.Preference.bradleyTerry(wins).collect()
    val byItem = rows.map(r => r.getAs[String]("item") ->
      r.getAs[Double]("strength")).toMap
    assert(byItem("a") == 0.7 && byItem("b") == 0.3, byItem.toString)
    val a = rows.find(_.getAs[String]("item") == "a").get
    assert(a.getAs[Long]("wins") == 7L && a.getAs[Long]("games") == 10L)
    assert(a.getAs[Long]("rnk") == 1L)
  }

  test("bradleyTerry orders a transitive three-item tournament") {
    // a dominates, c loses everything; strengths must rank a > b > c
    val wins = Seq(("a", "b", 6L), ("b", "a", 2L),
      ("b", "c", 5L), ("c", "b", 1L), ("a", "c", 4L))
      .toDF("winner", "loser", "n")
    val rows = ops.Preference.bradleyTerry(wins).collect()
    val rnk = rows.map(r => r.getAs[String]("item") ->
      r.getAs[Long]("rnk")).toMap
    assert(rnk == Map("a" -> 1L, "b" -> 2L, "c" -> 3L), rnk.toString)
    val ssum = rows.map(_.getAs[Double]("strength")).sum
    assert(math.abs(ssum - 1.0) <= 2e-6, s"strengths sum $ssum")
  }

  test("cycleRate flags rock-paper-scissors and clears a transitive " +
    "triple") {
    val rps = Seq(("r", "s", 5L), ("s", "p", 5L), ("p", "r", 5L))
      .toDF("winner", "loser", "n")
    val c1 = ops.Preference.cycleRate(rps).head
    assert(c1.getAs[Long]("n_triples") == 1L)
    assert(c1.getAs[Long]("n_cycles") == 1L)
    assert(c1.getAs[Double]("cycle_rate") == 1.0)

    val tri = Seq(("a", "b", 5L), ("b", "c", 5L), ("a", "c", 5L))
      .toDF("winner", "loser", "n")
    val c2 = ops.Preference.cycleRate(tri).head
    assert(c2.getAs[Long]("n_triples") == 1L)
    assert(c2.getAs[Long]("n_cycles") == 0L)
    assert(c2.getAs[Double]("cycle_rate") == 0.0)
  }

  test("cycleRate drops tied pairs (no majority, no triple)") {
    val tied = Seq(("a", "b", 3L), ("b", "a", 3L),
      ("b", "c", 1L), ("a", "c", 1L)).toDF("winner", "loser", "n")
    val c = ops.Preference.cycleRate(tied).head
    assert(c.getAs[Long]("n_majority_edges") == 2L)
    assert(c.getAs[Long]("n_triples") == 0L)
    assert(c.isNullAt(c.fieldIndex("cycle_rate")))
  }

  test("rbo is 1 - p^k on identical rankings and 0 on disjoint ones") {
    val a = (1L to 5L).map(i => (i, i)).toDF("pk", "rk")
    val same = ops.RankEval.rbo(a, a, k = 5, p = 0.9).head
    // telescoping: (1-p) Σ_{d=1..k} p^(d-1) = 1 - p^k
    assert(same.getAs[Double]("rbo") ==
      math.rint((1.0 - math.pow(0.9, 5)) * 1e6) / 1e6,
      same.toString)
    assert(same.getAs[Double]("agree_at_k") == 1.0)
    assert(same.getAs[Long]("n_common") == 5L)
    // full agreement at every unseen depth closes the band at exactly 1
    assert(same.getAs[Double]("rbo_ub") == 1.0, same.toString)

    val b = (1L to 5L).map(i => (i + 100L, i)).toDF("pk", "rk")
    val disj = ops.RankEval.rbo(a, b, k = 5, p = 0.9).head
    assert(disj.getAs[Double]("rbo") == 0.0)
    assert(disj.getAs[Long]("n_common") == 0L)
    // the residual envelope is exactly the unseen weight p^k
    assert(disj.getAs[Double]("rbo_ub") ==
      math.rint(math.pow(0.9, 5) * 1e6) / 1e6)
  }

  test("rbo is top-weighted: agreement at rank 1 beats agreement at " +
    "rank k") {
    // both comparisons share exactly one item; ranks differ
    val base = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("pk", "rk")
    val topMatch = Seq((1L, 1L), (20L, 2L), (30L, 3L)).toDF("pk", "rk")
    val botMatch = Seq((10L, 1L), (20L, 2L), (3L, 3L)).toDF("pk", "rk")
    val hi = ops.RankEval.rbo(base, topMatch, k = 3).head.getAs[Double]("rbo")
    val lo = ops.RankEval.rbo(base, botMatch, k = 3).head.getAs[Double]("rbo")
    assert(hi > lo, s"top-rank agreement $hi should beat bottom $lo")
  }
}
