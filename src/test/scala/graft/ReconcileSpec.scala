package graft

import org.apache.spark.sql.functions._
import graft.ops.Reconcile

/** Reconcile invariants: identical content diffs empty (in any column
  * order), each status fires on exactly its construction, the bucket
  * count catches pure-cardinality drift, and phase 2 only reads
  * divergent buckets. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, String, Double)*) =
    rows.toDF("id", "name", "v")

  test("identical frames: zero divergent buckets, empty diff") {
    val a = frame((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    assert(Reconcile.divergentBuckets(a, frame((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)), Seq("id")).count() == 0)
    assert(Reconcile.diffRows(a, a, Seq("id")).count() == 0)
  }

  test("identical content in a different column ORDER still diffs empty") {
    val a = frame((1L, "a", 1.0), (2L, "b", 2.0))
    val b = a.select($"v", $"id", $"name")
    assert(Reconcile.diffRows(a, b, Seq("id")).count() == 0)
  }

  test("mismatched column sets are rejected") {
    val a = frame((1L, "a", 1.0))
    intercept[IllegalArgumentException] {
      Reconcile.diffRows(a, a.drop("v"), Seq("id"))
    }
  }

  test("each status fires on exactly its row") {
    val l = frame((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val r = frame((1L, "a", 9.9), (3L, "c", 3.0), (4L, "d", 4.0)) // 1 changed, 2 dropped, 4 added
    val got = Reconcile.diffRows(l, r, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "changed"), (2L, "left_only"), (4L, "right_only")))
  }

  test("cdcRows: one signed row per change, update = retract + insert, unchanged silent") {
    val prev = frame((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val curr = frame((1L, "a", 1.0),                  // unchanged
      (2L, "b", 9.9),                                 // updated
      (4L, "d", 4.0))                                 // inserted; 3 deleted
    val got = Reconcile.cdcRows(prev, curr, Seq("id"))
      .as[(Long, String, Long, String, Double)].collect().toSet
    assert(got == Set(
      (2L, "update_del", -1L, "b", 2.0),
      (2L, "update_ins", 1L, "b", 9.9),
      (3L, "delete", -1L, "c", 3.0),
      (4L, "insert", 1L, "d", 4.0)))
  }

  test("cdcRows feeds the delta face: prev state + cdc deltas == curr state") {
    // the maintenance chain end-to-end: diff two snapshots, apply the
    // emitted deltas to the PREVIOUS snapshot's incremental state, and
    // land exactly on a fresh aggregate of the CURRENT snapshot
    import graft.ops.Incremental
    val prev = frame((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0))
    val curr = frame((2L, "x", 25.0), (3L, "y", 30.0), (4L, "y", 40.0))
    val cdc = Reconcile.cdcRows(prev, curr, Seq("id"))
    val applied = Incremental.finishDelta(Incremental.mergeDelta(Seq(
        Incremental.partialDelta(prev, $"name", $"v", lit(1L)),
        Incremental.partialDelta(cdc, $"name", $"v", $"weight"))))
      .select($"key", $"cnt", $"sum")
      .as[(String, Long, Double)].collect().toSet
    val direct = Incremental.finish(Incremental.merge(Seq(
        Incremental.partial(curr, $"name", $"v"))))
      .select($"key", $"cnt", $"sum")
      .as[(String, Long, Double)].collect().toSet
    assert(applied == direct)
  }

  test("a user column named 'bucket' is compared, not clobbered") {
    // regression: the internal bucket column used to be withColumn("bucket"),
    // overwriting a real 'bucket' column before the phase-2 row hash —
    // rows differing ONLY in it were flagged by phase 1 but never
    // reported by diffRows
    val l = Seq((1L, "x"), (2L, "y")).toDF("id", "bucket")
    val r = Seq((1L, "x"), (2L, "CHANGED")).toDF("id", "bucket")
    val got = Reconcile.diffRows(l, r, Seq("id")).as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed")))
    // and a column colliding with the __reconcile_* namespace is rejected
    intercept[IllegalArgumentException] {
      Reconcile.diffRows(
        l.withColumnRenamed("bucket", "__reconcile_bucket"),
        r.withColumnRenamed("bucket", "__reconcile_bucket"), Seq("id"))
    }
  }

  test("duplicated row (same key twice on one side): count catches what XOR cancels") {
    // the documented blind spot is EVEN-multiplicity content swaps; a
    // plain duplicate changes the bucket COUNT, so it must surface
    val l = frame((1L, "a", 1.0), (2L, "b", 2.0))
    val r = l.unionAll(frame((2L, "b", 2.0)))
    assert(Reconcile.divergentBuckets(l, r, Seq("id")).count() == 1)
  }

  test("property: arbitrary drop/change/add sets are classified exactly") {
    // generated perturbations, evaluated in one batched frame per case
    // (the PipelinePropertySpec convention): for any disjoint subsets
    // D (dropped), C (changed), A (added) of a base table, diffRows
    // must return exactly D→left_only ∪ C→changed ∪ A→right_only
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cases = (0 until 4).map { i =>
      val p = Gen.Parameters.default
      def pick(seed: Long, from: Seq[Long], frac: Double): Set[Long] =
        from.filter(k => Gen.choose(0.0, 1.0).apply(p, Seed(seed * 1000 + k))
          .exists(_ < frac)).toSet
      val ids = (1L to 150L)
      val d = pick(i * 3 + 1, ids, 0.1)
      val c = pick(i * 3 + 2, ids.filterNot(d), 0.1)
      val a = pick(i * 3 + 3, (151L to 180L), 0.5)
      (d, c, a)
    }
    cases.foreach { case (d, c, a) =>
      val base = (1L to 150L).map(k => (k, s"v$k", k * 1.5))
      val l = base.toDF("id", "name", "v")
      val r = (base.filterNot(x => d(x._1))
        .map(x => if (c(x._1)) (x._1, x._2, -9.9) else x) ++
        a.toSeq.sorted.map(k => (k, s"v$k", k * 1.5)))
        .toDF("id", "name", "v")
      val got = Reconcile.diffRows(l, r, Seq("id"), buckets = 8)
        .as[(Long, String)].collect().toSet
      val want = d.map(_ -> "left_only") ++ c.map(_ -> "changed") ++
        a.map(_ -> "right_only")
      assert(got == want, s"d=$d c=$c a=$a")
    }
  }

  test("phase 2 scopes to divergent buckets only") {
    // 200 identical rows + 1 changed: the changed key's bucket is the
    // single divergent one, and the row-level join's per-side input is
    // only that bucket's keys — strictly fewer than the full table
    val l = (1L to 200L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "v")
    val r = l.withColumn("v", when($"id" === 77L, lit(-1.0)).otherwise($"v"))
    val bad = Reconcile.divergentBuckets(l, r, Seq("id"), buckets = 16)
      .as[Long].collect().toSeq
    assert(bad.size == 1)
    val expectedBucket = l.filter($"id" === 77L)
      .select(pmod(xxhash64($"id"), lit(16))).as[Long].head()
    assert(bad.head == expectedBucket)
    val scopedRows = l.withColumn("b", pmod(xxhash64($"id"), lit(16)))
      .filter($"b" === expectedBucket).count()
    assert(scopedRows < 200)
    assert(Reconcile.diffRows(l, r, Seq("id"), buckets = 16)
      .as[(Long, String)].collect().toSet == Set((77L, "changed")))
  }
}
