package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Dedup, MisraGries, Portable, Sampling}

/** Property tests for the sketch/estimator ops (ADVICE r7): Misra–Gries
  * counter bounds and exact-recount equality, priority-sample
  * determinism and top-k/τ agreement with an independent brute force,
  * containment vs a brute-force overlap coefficient.
  */
class SketchSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Spark's `round` is HALF_UP; `math.rint` is half-to-even. Expected
    * values must mirror Spark's mode exactly or a priority landing on a
    * 6dp half-way point flakes the comparison. */
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Skewed item stream: a few hot items over a uniform tail. */
  private def stream(seed: Int, n: Int): Seq[String] = {
    val g = Gen.frequency(
      (5, Gen.const("hot1")), (3, Gen.const("hot2")),
      (1, Gen.choose(0, 500).map(i => s"tail$i")))
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed * 100000L + i)))
  }

  test("MisraGries sketch: counter bounds and superset guarantee") {
    val items = stream(1, 4000)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    for (k <- Seq(2, 5, 20)) {
      // run the raw Aggregator across several partitionings — merge order
      // must not break the bounds
      for (parts <- Seq(1, 4, 7)) {
        val mg = udaf(new MisraGries(k))
        val sketch = spark.createDataset(items).repartition(parts)
          .select(mg(col("value")).as("s"))
          .as[Map[String, Long]].head()
        assert(sketch.size <= k, s"k=$k parts=$parts: ${sketch.size} counters")
        sketch.foreach { case (t, est) =>
          val truth = exact(t)
          // classic MG bound: truth - n/(k+1) <= est <= truth
          assert(est <= truth, s"k=$k $t overcounted: $est > $truth")
          assert(est >= truth - n / (k + 1) - 1, s"k=$k $t undercounted: $est vs $truth")
        }
        // superset guarantee: anything above n/(k+1) still holds a counter
        exact.foreach { case (t, c) =>
          if (c * (k + 1) > n)
            assert(sketch.contains(t), s"k=$k parts=$parts lost heavy item $t ($c/$n)")
        }
      }
    }
  }

  test("heavyHitters == exhaustive heavy hitters, exact counts, null-safe") {
    val items = stream(2, 3000)
    // interleave nulls: they must neither crash the Map buffer nor count
    // toward n_total
    val withNulls = items.map(Option(_)) ++ Seq.fill(200)(None: Option[String])
    val df = spark.createDataset(withNulls).toDF("tk").repartition(5)
    for (k <- Seq(3, 10)) {
      val got = MisraGries.heavyHitters(df, col("tk"), k)
        .as[(String, Long)].collect().toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = exact.filter { case (_, c) => c * (k + 1) > items.size }
      assert(got == want, s"k=$k: got $got want $want")
    }
  }

  test("heavyHittersPerGroup == per-group exhaustive; groups don't bleed") {
    // two groups with DIFFERENT hot items and different sizes: a group-
    // blind sketch would flag g1's hot items in g2 or dilute thresholds
    val g1 = stream(3, 3000).map(("g1", _))
    val g2 = (stream(4, 800) ++ Seq.fill(400)("only2")).map(("g2", _))
    val df = (g1 ++ g2).toDF("grp", "tk").repartition(5)
    for (k <- Seq(3, 10)) {
      val got = MisraGries.heavyHittersPerGroup(df, col("grp"), col("tk"), k)
        .as[(String, String, Long)].collect()
        .map { case (g, tk, c) => (g, tk) -> c }.toMap
      val want = (g1 ++ g2).groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case ((g, _), c) =>
          c * (k + 1) > (if (g == "g1") g1.size else g2.size)
        }.toMap
      assert(got == want, s"k=$k: got $got want $want")
    }
    // null group / null item rows vanish rather than forming groups
    val withNulls = spark.createDataset(
      Seq((Option("g"), Option("x")), (None: Option[String], Option("x")),
        (Option("g"), None: Option[String]))).toDF("grp", "tk")
    val res = MisraGries.heavyHittersPerGroup(withNulls, col("grp"), col("tk"), 4)
      .as[(String, String, Long)].collect().toSet
    assert(res == Set(("g", "x", 1L)))
  }

  test("negativeSample: disjoint from positives, deterministic, ranks total") {
    val inter = samples(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0, 25)), 400)
      .toDF("u", "it")
    val a = Sampling.negativeSample(inter, col("u"), col("it"), k = 4, oversample = 12)
    val rows = a.as[(Long, Int, Int)].collect()
    val pos = inter.as[(Long, Int)].collect().toSet
    // no sampled negative is a positive
    rows.foreach { case (u, _, it) => assert(!pos.contains((u, it)), s"($u,$it)") }
    // per user: ranks are 1..n without holes, items distinct
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq, s"user $u ranks")
      assert(rs.map(_._3).distinct.length == rs.length, s"user $u dup item")
      assert(rs.length <= 4)
    }
    // pure function of the data: a second build and a repartitioned
    // build both reproduce the sample bit-for-bit
    val b = Sampling.negativeSample(inter.repartition(7), col("u"), col("it"),
      k = 4, oversample = 12).as[(Long, Int, Int)].collect()
    assert(rows.sorted.toSeq == b.sorted.toSeq)
  }

  /** Independent brute-force priority: same dyadic-rational formula,
    * computed via java MessageDigest rather than the Spark expression. */
  private def bruteP60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def brutePriority(key: Long, w: Double): Double =
    w / (((bruteP60(key.toString) >> 8).toDouble + 0.5) / (1L << 52).toDouble)

  test("prioritySample: deterministic, top-k by priority, correct tau") {
    val rows = samples(Gen.zip(Gen.choose(1L, 100000L), Gen.choose(1, 500)), 300)
      .distinctBy(_._1) // unique keys, per the documented contract
    val df = rows.toDF("id", "wt")
    val k = 40
    val got = Sampling.prioritySample(df, col("id"), col("wt"), k)
      .as[(Long, Double, Int, Double, Double)].collect().sortBy(_._3)
    val again = Sampling.prioritySample(df.repartition(7), col("id"), col("wt"), k)
      .as[(Long, Double, Int, Double, Double)].collect().sortBy(_._3)
    assert(got.toSeq == again.toSeq, "not deterministic across partitionings")
    assert(got.length == k)
    // brute force: rank every row by (priority desc, key), take k, tau =
    // the (k+1)-th priority
    val ranked = rows.map { case (id, wt) => (id, wt.toDouble, brutePriority(id, wt)) }
      .sortBy { case (id, _, p) => (-p, id) }
    assert(got.map(_._1).toSeq == ranked.take(k).map(_._1).toSeq, "kept set differs")
    val tau = ranked(k)._3
    got.foreach { case (id, w, _, _, wHat) =>
      val expect = round6(math.max(w, tau))
      assert(math.abs(wHat - expect) < 1e-9, s"id=$id w_hat $wHat != max(w,tau) $expect")
    }
    // subset-sum sanity: every kept row's estimator weight >= its weight,
    // and rows with w > tau are carried exactly (HT inclusion prob 1)
    got.foreach { case (_, w, _, _, wHat) =>
      assert(wHat + 1e-9 >= w)
      if (w > tau) assert(math.abs(wHat - round6(w)) < 1e-9)
    }
  }

  test("corpusCollisions == batch side of lshCandidates' cross-split pairs") {
    // three groups of 8 identical docs (guaranteed band collisions in
    // every split) plus 16 unique docs (no collisions); batch = id%4==0
    val docs = (0L until 40L).map { i =>
      val text =
        if (i < 24) (1 to 30).map(j => s"g${i / 8}w$j").mkString(" ")
        else (1 to 30).map(j => s"u${i}w$j").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.shingles(docs, n = 3), 16).cache()
    val batch = sigs.filter(col("id") % 4 === 0)
    val corpus = sigs.filter(col("id") % 4 =!= 0)
    val got = Dedup.corpusCollisions(batch, corpus).as[Long].collect().toSet
    // the asymmetric probe must agree exactly with the symmetric
    // candidate join restricted to cross-split pairs
    val want = Dedup.lshCandidates(sigs).as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (x, y) if x % 4 == 0 && y % 4 != 0 => x }.toSet
    assert(got == want, s"got $got want $want")
    // the three identical-text groups each contain both parities, so
    // every batch member of a group collides; unique docs never do
    assert(got == Set(0L, 4L, 8L, 12L, 16L, 20L), s"unexpected collision set $got")
    sigs.unpersist()
  }

  test("containmentPairs == brute-force overlap; superset doc scores 1.0") {
    // doc 1 is a strict subset of doc 2 (quoted-inside case); docs 3/4
    // overlap partially; doc 5 is disjoint
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb"),
      (3L, "p q r s t u v w"),
      (4L, "s t u v w x y z"),
      (5L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, n = 3)
    val got = Dedup.containmentPairs(sh, minOverlap = 0.0)
      .as[(Long, Long, Double)].collect()
      .map { case (d1, d2, ov) => (d1, d2) -> ov }.toMap
    // brute force over shingle sets
    def shingleSet(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val sets = Seq(1L, 2L, 3L, 4L, 5L)
      .zip(docs.as[(Long, String)].collect().sortBy(_._1).map(t => shingleSet(t._2)))
    for ((i, si) <- sets; (j, sj) <- sets if i < j) {
      val inter = (si & sj).size
      if (inter == 0) assert(!got.contains((i, j)), s"($i,$j) should be absent")
      else {
        val want = round6(inter.toDouble / math.min(si.size, sj.size))
        assert(math.abs(got((i, j)) - want) < 1e-9, s"($i,$j): ${got((i, j))} != $want")
      }
    }
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-9, "subset doc must score overlap 1.0")
    // and jaccard never exceeds overlap on the same pairs
    val jac = Dedup.jaccardPairs(sh, minJaccard = 0.0)
      .as[(Long, Long, Double)].collect()
      .map { case (d1, d2, v) => (d1, d2) -> v }.toMap
    jac.foreach { case (pair, v) => assert(v <= got(pair) + 1e-9, s"$pair jaccard > overlap") }
  }
}
