package graft

import org.apache.spark.sql.functions._
import graft.ops.KMeans

/** Value-level pins for the hand-rolled Lloyd k-means (graft.ops.KMeans):
  * geometry on an unambiguous 2-cluster fixture, the tie and
  * empty-cluster rules the DuckDB oracle also encodes, and determinism
  * across layouts.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // two tight groups around (0,0) and (10,10); ids 0 and 1 land one
    // seed in each group
    (0L, Seq(0.1f, 0.0f)), (1L, Seq(10.0f, 10.1f)),
    (2L, Seq(0.0f, 0.2f)), (3L, Seq(9.9f, 10.0f)),
    (4L, Seq(0.2f, 0.1f)), (5L, Seq(10.1f, 9.9f))
  ).toDF("vec_id", "embedding")

  test("lloyd separates two obvious clusters and centroids are the group means") {
    val (asg, cents) = KMeans.lloyd(fixture, "vec_id", "embedding", k = 2, iters = 2)
    val byCluster = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(0L, 2L, 4L).map(byCluster) == Set(0))
    assert(Set(1L, 3L, 5L).map(byCluster) == Set(1))
    // centroid 0 = mean of the three points near the origin, 6dp-rounded
    assert(math.abs(cents(0)(0) - (0.1 + 0.0 + 0.2) / 3) < 1e-6)
    assert(math.abs(cents(0)(1) - (0.0 + 0.2 + 0.1) / 3) < 1e-6)
    assert(math.abs(cents(1)(0) - (10.0 + 9.9 + 10.1) / 3) < 1e-6)
  }

  test("exact distance ties break to the lowest centroid index") {
    // identical points at ids 0 and 1 seed two IDENTICAL centroids:
    // every point ties on distance, so everything must land on index 0
    val dup = Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(1.5f, 1.0f)), (3L, Seq(0.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val (asg, cents) = KMeans.lloyd(dup, "vec_id", "embedding", k = 2, iters = 2)
    assert(asg.collect().map(_.getInt(1)).toSet == Set(0))
    // cluster 1 went empty and must keep its seed centroid verbatim
    assert(cents(1) == Seq(1.0, 1.0))
  }

  test("assignment is partition-layout invariant (shuffle-free argmin)") {
    val a = KMeans.lloyd(fixture, "vec_id", "embedding", k = 2, iters = 3)._1
    val b = KMeans.lloyd(fixture.repartition(7, col("vec_id")),
      "vec_id", "embedding", k = 2, iters = 3)._1
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
  }

  test("assignJoin returns exactly the inline assignment (shared determinism contract)") {
    val (asg, cents) = KMeans.lloyd(fixture, "vec_id", "embedding", k = 2, iters = 2)
    val inline = asg.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val joined = KMeans.assignJoin(fixture, "vec_id", "embedding", cents)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(joined == inline)
  }

  test("assignJoin ties break to the lowest centroid index, like assign") {
    // two IDENTICAL centroids: every point ties on (rounded) distance,
    // so the ArgMin aggregator's (dist ASC, cidx ASC) rule must put
    // everything on index 0 — the same verdict the inline array_min
    // struct ordering gives
    val dupCents = Seq(Seq(1.0, 1.0), Seq(1.0, 1.0))
    val asg = KMeans.assignJoin(fixture, "vec_id", "embedding", dupCents)
    assert(asg.collect().map(_.getInt(1)).toSet == Set(0))
  }

  test("assignJoin scales k past the inline form's expression ceiling") {
    // 600 centroids: far beyond what k inlined literal branches should
    // be asked to codegen, trivial as broadcast data — every vector
    // must land on its nearest (here: centroid index == argmin by
    // construction, ties impossible)
    val k = 600
    val cents = (0 until k).map(i => Seq(i * 10.0, 0.0))
    val pts = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(4998.0f, 0.0f)),
      (2L, Seq(5992.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = KMeans.assignJoin(pts, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 500, 2L -> 599))
  }

  test("assignScan == assignJoin on real embeddings (rounding + tie parity)") {
    // the closure-scan face hand-replicates round(sqrt(d2), 6)'s
    // BigDecimal HALF_UP semantics — pin it against the Catalyst
    // expression on all 2000 real vectors × 20 real centroids, distance
    // included (the d column is where a rounding divergence would show
    // first, before it ever flips an argmin)
    val emb = graft.queries.Tables(spark, sf, "embeddings")
    val (_, cents) = KMeans.lloyd(emb, "vec_id", "embedding", k = 20, iters = 2)
    val scan = KMeans.assignScan(emb, "vec_id", "embedding", cents)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val join = KMeans.assignJoinWithDist(emb, "vec_id", "embedding", cents)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(scan == join)
    assert(scan.map(_._2).distinct.size > 1)
  }

  test("assignScan ties break to the lowest centroid index, like the other faces") {
    val dupCents = Seq(Seq(1.0, 1.0), Seq(1.0, 1.0))
    val asg = KMeans.assignScan(fixture, "vec_id", "embedding", dupCents)
    assert(asg.collect().map(_.getInt(1)).toSet == Set(0))
  }

  test("lloydJoin == lloyd at the q203 scaled k (real embeddings, k = 20)") {
    // the corpus-scaled-k face must land on the inline face's exact
    // centroids and assignments — the shared determinism contract, pinned
    // at the k the q203 registration actually uses at sf0.1
    val emb = graft.queries.Tables(spark, sf, "embeddings")
    val (asgA, centsA) = KMeans.lloyd(emb, "vec_id", "embedding", k = 20, iters = 2)
    val (asgB, centsB) = KMeans.lloydJoin(emb, "vec_id", "embedding", k = 20, iters = 2)
    assert(centsA == centsB)
    val a = asgA.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val b = asgB.orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(a == b)
    assert(a.map(_._2).distinct.size > 1) // the pin is not vacuous
  }

  test("scaledK: kmin clamp below, integer ceil-div above") {
    assert(KMeans.scaledK(500) == 10)    // sf0.01 corpus — clamped
    assert(KMeans.scaledK(2000) == 20)   // sf0.1 corpus — scaled
    assert(KMeans.scaledK(2001) == 21)   // ceil, not floor
    assert(KMeans.scaledK(100000000L) == 1000000) // corpus-sized k stays exact
    assert(KMeans.scaledK(0) == 10)
    // past Int range the op fails loudly instead of .toInt-wrapping
    val e = intercept[IllegalArgumentException] {
      KMeans.scaledK(Long.MaxValue - 100)
    }
    assert(e.getMessage.contains("raise divisor"))
  }

  test("iters = 0 assigns against the raw lowest-id seeds") {
    val (asg, cents) = KMeans.lloyd(fixture, "vec_id", "embedding", k = 2, iters = 0)
    // seeds are rows 0 and 1 cast to double, untouched
    assert(cents(0) == Seq(0.1f.toDouble, 0.0))
    assert(cents(1) == Seq(10.0f.toDouble, 10.1f.toDouble))
    assert(asg.filter(col("id") === 2L).head().getInt(1) == 0)
    assert(asg.filter(col("id") === 3L).head().getInt(1) == 1)
  }
}
