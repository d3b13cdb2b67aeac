package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Sampling, TextPipeline}
import graft.queries.Tables

/** Property tests for the corpus-assembly operators: invariants over
  * generated inputs, evaluated in single batched Spark jobs (one frame
  * of generated docs, not one job per sample). */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("chunk: every token is covered, counts match the closed form") {
    val lens = samples(Gen.choose(1, 200), 60).distinct
    val docs = lens.map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val C = 64
    val S = 48
    val chunks = TextPipeline.chunk(docs, chunkSize = C, stride = S)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"n_tokens").as("sum_tokens"),
        max($"n_tokens").as("max_tokens"))
      .as[(Long, Long, Long, Long)].collect()
    chunks.foreach { case (n, nChunks, sumTokens, maxTokens) =>
      val expectChunks = math.ceil(math.max(0, n - C) / S.toDouble).toLong + 1
      assert(nChunks == expectChunks, s"doc len $n: $nChunks != $expectChunks")
      assert(maxTokens <= C, s"doc len $n overlong chunk")
      // full coverage with overlap: (nChunks-1) overlaps of (C-S) tokens,
      // except the tail chunk which holds whatever remains
      val tail = n - (nChunks - 1) * S
      assert(sumTokens == (nChunks - 1) * C + tail,
        s"doc len $n: sum $sumTokens, chunks $nChunks")
    }
    assert(chunks.length == lens.length)
  }

  test("pack: bucketing-invariant, token-conserving, interior sequences full") {
    // non-contiguous, gap-heavy ids: the DIV bucketing must not assume
    // density, only non-negativity and order
    val lens = samples(Gen.choose(1, 300), 80)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      ((i.toLong * 7 + 3), (1 to n).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val L = 128
    val spans = TextPipeline.pack(docs, seqLen = L, bucketWidth = 32)
      .orderBy($"doc_id", $"seq_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // bucketWidth is an execution parameter, not a semantic one: one
    // giant bucket (the degenerate single-window case) must give the
    // exact same spans
    val oneBucket = TextPipeline.pack(docs, seqLen = L, bucketWidth = 1L << 40)
      .orderBy($"doc_id", $"seq_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == oneBucket, "spans differ across bucketings")
    // span-local bounds
    spans.foreach { case (d, q, pos, nTok) =>
      assert(pos >= 0 && pos < L, s"doc $d seq $q: pos $pos out of range")
      assert(nTok >= 1 && pos + nTok <= L, s"doc $d seq $q: span [$pos, ${pos + nTok}) overflows")
    }
    // token conservation: each doc's spans sum to its token count and
    // cover consecutive sequences
    val byDoc = spans.groupBy(_._1)
    val wantTokens = lens.zipWithIndex
      .map { case (n, i) => (i.toLong * 7 + 3) -> n.toLong }.toMap
    byDoc.foreach { case (d, ss) =>
      assert(ss.map(_._4).sum == wantTokens(d), s"doc $d: token count not conserved")
      val seqs = ss.map(_._2)
      assert(seqs == (seqs.min to seqs.max), s"doc $d: non-consecutive sequences")
    }
    // every sequence except the last is exactly full — the packing
    // property that makes the cut usable as training examples
    val bySeq = spans.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (q, tot) =>
      if (q < lastSeq) assert(tot == L, s"seq $q holds $tot tokens, want $L")
      else assert(tot <= L, s"last seq overfull: $tot")
    }
    assert(bySeq.values.sum == lens.map(_.toLong).sum, "global token count drifted")
  }

  test("sampling: rates nest and row counts grow monotonically") {
    val events = Tables(spark, sf, "events").select($"event_id").cache()
    try {
      val rates = samples(Gen.choose(0, 10000), 30).distinct.sorted
      // one job: tag every event with its hash slot, evaluate all rates
      val slots = events
        .select($"event_id",
          pmod(graft.ops.Portable.p60($"event_id".cast("string")), lit(10000)).as("slot"))
        .as[(Long, Long)].collect()
      val total = slots.length
      var prev = Set.empty[Long]
      var prevRate = -1
      rates.foreach { r =>
        val kept = slots.collect { case (id, s) if s < r => id }.toSet
        assert(prev.subsetOf(kept), s"rate $prevRate not nested in $r")
        // rate accuracy within 2.5pp for non-degenerate rates
        if (r >= 1000 && r <= 9000)
          assert(math.abs(kept.size.toDouble / total - r / 10000.0) < 0.025,
            s"rate $r kept ${kept.size}/$total")
        prev = kept
        prevRate = r
      }
      // and the DataFrame-side gate agrees with the collected slots
      val viaOp = Sampling.uniform(events, $"event_id", 2500)
        .as[Long].collect().toSet
      assert(viaOp == slots.collect { case (id, s) if s < 2500 => id }.toSet)
    } finally { events.unpersist(); () }
  }

  test("capPerKey: bound holds for every k, capped set nests in uncapped") {
    val events = Tables(spark, sf, "events")
    samples(Gen.choose(1, 5), 5).distinct.foreach { k =>
      val capped = Sampling.capPerKey(events, $"user_id", $"event_id", k)
        .groupBy($"user_id").count().as[(Long, Long)].collect()
      assert(capped.forall(_._2 <= k), s"k=$k violated")
    }
  }

  test("hygiene ratios are bounded; contamination shrinks as n grows") {
    val docs = Tables(spark, sf, "documents").cache()
    try {
      // dupSpanRatio and repetition emit ratios in [0,1] with consistent
      // numerators on the real corpus
      val spans = TextPipeline.dupSpanRatio(docs, n = 8)
        .as[(Long, Long, Long, Double)].collect()
      assert(spans.nonEmpty)
      spans.foreach { case (id, nSpans, nDup, ratio) =>
        assert(nDup >= 0 && nDup <= nSpans && ratio >= 0.0 && ratio <= 1.0, s"doc $id")
      }
      val reps = TextPipeline.repetition(docs, n = 2)
        .as[(Long, Long, Double, Double)].collect()
      reps.foreach { case (id, nGrams, top, dup) =>
        assert(top > 0.0 && top <= 1.0 && dup >= 0.0 && dup <= 1.0, s"doc $id")
        // 5e-7 slack: top_ratio is rounded to 6dp, which can land just
        // below the exact uniform floor 1/n_grams
        assert(top >= 1.0 / nGrams - 5e-7, s"doc $id: top ratio below uniform floor")
      }
      // containment law: sharing an (n+1)-gram implies sharing both its
      // n-gram halves, so the contaminated set can only shrink as n grows
      val train = docs.filter($"doc_id" % 97 =!= 0)
      val bench = docs.filter($"doc_id" % 97 === 0)
      val flaggedAt = (n: Int) => TextPipeline.decontaminate(train, bench, n)
        .filter($"contaminated").select($"doc_id").as[Long].collect().toSet
      val f2 = flaggedAt(2)
      val f3 = flaggedAt(3)
      val f5 = flaggedAt(5)
      assert(f3.subsetOf(f2) && f5.subsetOf(f3),
        s"contamination not monotone: |f2|=${f2.size} |f3|=${f3.size} |f5|=${f5.size}")
    } finally docs.unpersist()
  }

  test("mixByTokenBudget: achieved tokens track budgets, clamp keeps all") {
    val toks = Tables(spark, sf, "documents")
      .select($"doc_id", size(graft.ops.Portable.tokens($"text")).cast("long").as("n_tokens"))
      .cache()
    try {
      val total = toks.agg(sum($"n_tokens")).as[Long].head()
      val half = total / 2
      val mixed = Sampling.mixByTokenBudget(Seq(
          ("half", toks, half), ("all", toks, total * 10)))
        .groupBy($"origin").agg(sum($"n_tokens").as("got"), count(lit(1)).as("rows"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
      // over-budget source clamps to keep-all
      assert(mixed("all")._2 == total)
      // half-budget source lands near half (hash gate is row-random,
      // token-weighted in expectation; wide tolerance for a small corpus)
      val got = mixed("half")._2.toDouble
      assert(got > half * 0.5 && got < half * 1.5, s"got $got of target $half")
      // determinism: same call, same rows
      val again = Sampling.mixByTokenBudget(Seq(("half", toks, half)))
        .agg(sum($"n_tokens")).as[Long].head()
      assert(again == mixed("half")._2)
    } finally toks.unpersist()
  }

  test("Binning.equiDepth: generated frames — every k balanced within 1, no row lost") {
    import graft.ops.Binning
    // 3 groups with generated sizes and duplicate-heavy values
    val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 30)), 400)
      .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v.toLong) }
    val df = rows.toDF("g", "id", "v")
    for (k <- 1 to 6) {
      val binned = Binning.equiDepth(df, $"g", Seq($"v", $"id"), k)
      assert(binned.count() == rows.length.toLong, s"k=$k lost rows")
      val spread = binned.groupBy($"g", $"bucket").count()
        .groupBy($"g").agg((max($"count") - min($"count")).as("sp"),
          countDistinct($"bucket").as("nb"))
        .as[(String, Long, Long)].collect()
      spread.foreach { case (g, sp, nb) =>
        assert(sp <= 1, s"k=$k group $g spread $sp")
        val gSize = rows.count(_._1 == g)
        assert(nb == math.min(k, gSize).toLong, s"k=$k group $g buckets $nb")
      }
    }
  }

  test("RankEval.metrics: bounds hold; a prefix-perfect list scores 1 everywhere") {
    import graft.ops.RankEval
    // generated truth sets of varying size; recs = the truth's k lowest
    // items in rank order (prefix-perfect when |truth| >= k)
    val k = 4
    val users = samples(Gen.choose(1, 12), 30).distinct
    val truth = users.flatMap(u => (0 until u).map(i => (s"u$u", i.toLong)))
      .toDF("user", "item")
    val recs = users.flatMap(u =>
        (0 until math.min(k, u)).map(i => (s"u$u", i.toLong, i + 1)))
      .toDF("user", "item", "rank")
    val m = RankEval.metrics(recs, truth, k).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (nRel, hits) = (r.getLong(1), r.getLong(2))
      val Seq(p, rec, ndcg, mrr) = (3 to 6).map(r.getDouble)
      assert(hits == math.min(k, nRel), r.toString) // prefix-perfect
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1, r.toString)
      assert(ndcg == 1.0, s"prefix-perfect ndcg must be 1: $r")
      assert(mrr == 1.0, r.toString)
      if (nRel >= k) assert(p == 1.0, r.toString) else assert(rec == 1.0, r.toString)
    }
  }

  test("Prorate.largestRemainder: generated groups — exact sums, shares within 1 of ideal") {
    // arbitrary (total, weights) groups: allocation must (a) sum exactly
    // to the total, (b) never deviate more than one unit from the real
    // share T·w/W (the defining Hamilton property), (c) be non-negative
    val gen = for {
      t <- Gen.choose(0L, 100000L)
      ws <- Gen.nonEmptyListOf(Gen.choose(0L, 500L))
      if ws.sum > 0
    } yield (t, ws)
    val groups = samples(gen, 40).zipWithIndex
    val rows = groups.flatMap { case ((t, ws), g) =>
      ws.zipWithIndex.map { case (w, i) => (g.toLong, i.toLong, w, t) }
    }.toDF("k", "i", "w", "t")
    val out = graft.ops.Prorate.largestRemainder(rows, $"k", $"i", $"w", $"t")
      .as[(Long, Long, Long, Long)].collect()
    val byKey = out.groupBy(_._1)
    groups.foreach { case ((t, ws), g) =>
      val allocs = byKey(g.toLong).sortBy(_._2).map(_._4)
      assert(allocs.sum == t, s"group $g leaks: ${allocs.sum} != $t")
      assert(allocs.forall(_ >= 0L))
      val bigW = ws.sum
      allocs.zip(ws).foreach { case (a, w) =>
        val ideal = t.toDouble * w / bigW
        assert(math.abs(a - ideal) < 1.0 + 1e-9,
          s"group $g: alloc $a vs ideal $ideal (t=$t w=$w W=$bigW)")
      }
    }
  }

  test("kaplanMeier: equals the pure-Scala reference on generated censored cohorts") {
    // generated (duration, event) subjects vs an independent plain-Scala
    // KM: risk sets by suffix count, survival by the same t-ascending
    // left fold — the arithmetic sequence is identical by construction,
    // so equality is EXACT (after the 6dp reporting round), not
    // tolerance-based; exercises ties, interleaved censoring, and
    // all-censored tails the single hand fixture can't cover
    val subjects = samples(Gen.zip(Gen.choose(0L, 15L), Gen.oneOf(true, false)), 300)
    val df = subjects.toDF("t", "event")
    val got = graft.ops.Survival.kaplanMeier(df, col("t"), col("event"))
      .orderBy($"t").as[(Long, Long, Long, Long, Double)].collect().toSeq
    // reference: plain Scala
    val hist = subjects.groupBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    var surv = 1.0
    val want = hist.flatMap { case (t, cnt, d) =>
      val nRisk = hist.filter(_._1 >= t).map(_._2).sum
      if (d > 0) {
        surv = surv * ((nRisk - d).toDouble / nRisk.toDouble)
        Some((t, nRisk, d, cnt - d, surv,
          BigDecimal(surv).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      } else None
    }
    assert(got == want.map(w => (w._1, w._2, w._3, w._4, w._6)),
      s"got $got\nwant $want")
    // median survival: verdict on the UNROUNDED curve (a surv printing
    // 0.5 at 6dp but sitting above it has NOT reached the median)
    val med = graft.ops.Survival.medianSurvival(df, col("t"), col("event"))
    assert(med == want.find(_._5 <= 0.5).map(_._1), med.toString)
  }

  test("marginTopMatch: scale-invariant (cosine geometry only) and in [0, 2] band") {
    // margins depend only on ANGLES: rescaling any vector by a positive
    // constant must not change a single output row (the 6dp cosine pin
    // makes this exact, not approximate). Generated 4-d vectors, even
    // ids = query side; the scaled frame multiplies each vector by a
    // per-id positive factor in [0.25, 4].
    val vecs = samples(Gen.listOfN(4, Gen.choose(-100, 100)), 40)
      .zipWithIndex
      .map { case (v, i) =>
        (i.toLong, v.map(x => x.toDouble / 10 + 0.1).toArray)
      }
      .filter { case (_, v) => v.exists(_ != 0d) }
    val scales = samples(Gen.choose(25, 400), vecs.size)
    val base = vecs.toDF("vec_id", "embedding")
    val scaled = vecs.zip(scales).map { case ((id, v), s) =>
      (id, v.map(_ * (s / 100.0)))
    }.toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Similarity
        .marginTopMatch(graft.ops.Similarity.prepare(df),
          col("id") % 2 === 0, k = 3)
        .orderBy($"qid")
        .as[(Long, Long, Double, Option[Double])].collect().toSeq
    val a = run(base)
    val b = run(scaled)
    assert(a.nonEmpty)
    // float32 storage means the rescale can nudge a 6dp cosine by one
    // grain; compare matches exactly and margins within that grain
    assert(a.map(r => (r._1, r._2)) == b.map(r => (r._1, r._2)),
      s"matches changed under rescale:\n$a\nvs\n$b")
    a.zip(b).foreach { case (x, y) =>
      (x._4, y._4) match {
        case (Some(mx), Some(my)) => assert(math.abs(mx - my) < 1e-4, s"$x vs $y")
        case (ox, oy) => assert(ox == oy, s"$x vs $y")
      }
    }
    // the ratio-margin band: cos in [-1,1] and neighborhood means built
    // from the SAME top-k lists keep well-formed margins finite; all
    // observed margins for unit-positive data sit in a sane band
    a.flatMap(_._4).foreach(m => assert(m > -10 && m < 10, m.toString))
  }
}
