package graft

import org.apache.spark.sql.functions._
import graft.ops.Checks
import graft.ops.Checks._
import graft.queries.Tables

/** Checks-suite invariants: golden pass/fail verdicts per constraint
  * type, null handling, the one-scan plan claim, and the HLL
  * ApproxUnique twin's tolerance band. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def results(df: org.apache.spark.sql.DataFrame, cs: Seq[Check]) =
    Checks.run(df, cs).as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("golden verdicts: each constraint type passes and fails on point data") {
    val df = Seq(
      (1L, Some("a"), 10.0, "OK"),
      (2L, None, 20.0, "OK"),
      (3L, Some("c"), 999.0, "BAD")).toDF("id", "opt", "v", "status")
    val r = results(df, Seq(
      Complete("id"),                      // 1.0 -> pass
      Complete("opt", atLeast = 0.5),      // 2/3 -> pass at 0.5
      Complete("opt"),                     // 2/3 -> fail at 1.0
      Unique(Seq("id")),                   // pk -> pass
      Bounds("v", 0.0, 100.0),             // 999 breaks -> fail
      InSet("status", Seq("OK"))))         // BAD breaks -> fail
    assert(r("complete(id)>=1.0") == ((1.0, true)))
    assert(r("complete(opt)>=0.5")._2 == true)
    assert(r("complete(opt)>=1.0")._2 == false)
    assert(r("unique(id)") == ((1.0, true)))
    assert(r("bounds(v)[0.0,100.0]")._2 == false
      && math.abs(r("bounds(v)[0.0,100.0]")._1 - 2.0 / 3) < 1e-6)
    assert(r("in_set(status){OK}")._2 == false)
    // parameterized names make the two Complete(opt) checks DISTINCT
    // map keys — the pre-fix toMap silently collapsed them
    assert(r.size == 6)
  }

  test("Unique fails on a duplicated key; nulls don't break Bounds/InSet") {
    val df = Seq((1L, null.asInstanceOf[String]), (1L, "x"))
      .toDF("id", "s")
    val r = results(df, Seq(Unique(Seq("id")), InSet("s", Seq("x"))))
    assert(r("unique(id)") == ((0.5, false)))
    assert(r("in_set(s){x}") == ((1.0, true))) // null is not a violation
  }

  test("empty table fails closed: null metrics, passed = false (never null)") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val rows = Checks.run(empty, Seq(
      Complete("id"), Bounds("id", 0.0, 10.0), Matches("s", "^x$", 0.5)))
      .collect()
    // every metric is NULL (no evidence), every verdict is a REAL false
    // — a Boolean-typed gate must not hit a null-unboxing error
    assert(rows.length == 3)
    assert(rows.forall(_.isNullAt(1)))
    assert(rows.forall(r => !r.isNullAt(2) && !r.getBoolean(2)))
  }

  test("duplicate fully-parameterized declarations are rejected") {
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Checks.run(df, Seq(Bounds("id", 0.0, 1.0), Bounds("id", 0.0, 1.0)))
    }
    // same column, different params: distinct names, both allowed
    val r = results(df, Seq(Bounds("id", 0.0, 1.0), Bounds("id", 0.0, 2.0)))
    assert(r.size == 2)
    // same column AND threshold, different regexes: the regex is part of
    // the name, so both declarations coexist and keep their verdicts
    val rm = results(df, Seq(Matches("s", "^x$", 0.5), Matches("s", "^y$", 0.5)))
    assert(rm.size == 2)
    assert(rm("matches(s,^x$)>=0.5")._2 && !rm("matches(s,^y$)>=0.5")._2)
  }

  test("ApproxUnique: HLL ratio within tolerance on a real key, catches 2x dup") {
    val orders = Tables(spark, sf, "orders")
    val r1 = results(orders, Seq(ApproxUnique(Seq("o_orderkey"), 0.05)))
    assert(r1("approx_unique(o_orderkey)~0.05")._2,
      r1.toString) // estimate/count within 5% of 1.0
    val doubled = orders.unionAll(orders)
    val r2 = results(doubled, Seq(ApproxUnique(Seq("o_orderkey"), 0.05)))
    assert(!r2("approx_unique(o_orderkey)~0.05")._2) // ratio ~0.5, way outside
  }

  test("Matches: regex ratio with nulls excluded from the denominator") {
    val df = Seq(Some("1-URGENT"), Some("oops"), None).toSeq.toDF("p")
    val r = results(df, Seq(Matches("p", "^[0-9]-[A-Z]+$", 0.5)))
    assert(r("matches(p,^[0-9]-[A-Z]+$)>=0.5") == ((0.5, true)))
  }

  test("containment: exact orphan rate, null fact keys excluded, empty side fails closed") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    // 2 of 3 non-null keys resolve; the null is out of the denominator
    val r = Checks.containment(fact, "fk", dim, "k", atLeast = 0.5).collect().head
    assert(r.getString(0) == "contained(fk in k)>=0.5")
    assert(math.abs(r.getDouble(1) - 2.0 / 3) < 1e-6 && r.getBoolean(2))
    // at the default 1.0 threshold the same data fails
    assert(!Checks.containment(fact, "fk", dim, "k").collect().head.getBoolean(2))
    // duplicate dim keys must not inflate the metric (distinct key set)
    val dup = Seq(1L, 1L, 1L).toDF("k")
    val one = Seq(Some(1L), Some(2L)).toDF("fk")
    assert(Checks.containment(one, "fk", dup, "k").collect().head.getDouble(1) == 0.5)
    // no evidence -> NULL metric, REAL false verdict
    val empty = Seq.empty[Option[Long]].toDF("fk")
    val e = Checks.containment(empty, "fk", dim, "k").collect().head
    assert(e.isNullAt(1) && !e.getBoolean(2))
    // the verdict gates on the UNROUNDED metric: one orphan among two
    // million keys reads 1.0 at 6dp but must still FAIL a 1.0 threshold
    // (the regime the op exists for — tiny orphan rates at scale)
    val bigDim = spark.range(0, 2000000).toDF("k")
    val bigFact = spark.range(0, 2000001).toDF("fk") // key 2000000 is orphan
    val b = Checks.containment(bigFact, "fk", bigDim, "k").collect().head
    assert(b.getDouble(1) == 1.0 && !b.getBoolean(2), b.toString)
  }

  test("the suite is ONE scan: no-distinct suite plans a single aggregate, no shuffle join") {
    val plan = Checks.run(Tables(spark, sf, "orders"), Seq(
      Complete("o_custkey"), Bounds("o_totalprice", 0.0, 1e9),
      InSet("o_orderstatus", Seq("F", "O", "P"))))
      .queryExecution.executedPlan.toString
    // all three metrics ride one partial+final aggregate pair over one
    // scan — no join of per-check subplans, one exchange (to the 1-row
    // final agg)
    assert(!plan.contains("Join"), plan.take(800))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan.take(800))
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, plan.take(800))
  }
}
