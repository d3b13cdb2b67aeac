package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.queries.Tables
import graft.streaming.EventStreams

/** Structured Streaming specs: the same transforms produce identical
  * results from readStream (file source) and the batch frame, session
  * windows close on gaps, and the custom stateful op accumulates. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("hourlyByType: streaming (complete mode) == batch") {
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.hourlyByType(stream)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select($"hour", $"event_type", $"n", $"total_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStreams.hourlyByType(Tables(spark, sf, "events"))
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("slidingByType: hopping windows streaming (complete mode) == batch") {
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.slidingByType(stream)
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_out")
        .select($"win_start", $"event_type", $"n", $"total_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      val batch = EventStreams.slidingByType(Tables(spark, sf, "events"))
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // every tumbling hour of q56 is one of the 4-hop windows; the hop
      // family is strictly larger
      val tumbling = EventStreams.hourlyByType(Tables(spark, sf, "events")).count()
      assert(batch.size > tumbling)
    } finally q.stop()
  }

  test("slidingByType: append mode drops a late row from exactly its 4 hops") {
    // Event time t lands in the 4 hop windows starting at
    // floor15(t)-45m .. floor15(t); a row arriving after the 2h
    // watermark has passed ALL four of its window ends must not appear
    // anywhere — neither bumping the already-emitted closed windows nor
    // conjuring new ones. Controlled micro-batches via MemoryStream;
    // watermark advances at batch END, so emissions land one batch late.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = EventStreams.slidingByType(ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("sliding_late")
      .outputMode(OutputMode.Append).start()
    try {
      def step(rows: (java.sql.Timestamp, String, Double)*): Unit = {
        ms.addData(rows: _*); q.processAllAvailable()
      }
      step((ts("2024-01-01 10:00:00"), "a", 1.0)) // wm after: 08:00
      step((ts("2024-01-01 14:00:00"), "a", 1.0)) // wm after: 12:00 — 10:00's hops all end <= 12:00
      // LATE: 10:05 < wm 12:00; its hops (ends 10:15..11:00) are closed
      step((ts("2024-01-01 10:05:00"), "a", 7.0))
      step((ts("2024-01-01 18:00:00"), "a", 1.0)) // wm after: 16:00
      step((ts("2024-01-01 22:00:00"), "a", 1.0)) // batch runs at wm 16:00 — emits 14:00's hops
      val got = spark.table("sliding_late")
        .select($"win_start", $"n", $"total_value")
        .as[(java.sql.Timestamp, Long, Double)].collect()
        .map(x => x._1 -> ((x._2, x._3))).toMap
      // the 10:00 event's exactly-4 hops, all n=1 — the late 10:05 row
      // (same 4 hops) neither raised a count nor added value
      val hops10 = Seq("09:15", "09:30", "09:45", "10:00")
        .map(m => ts(s"2024-01-01 $m:00"))
      hops10.foreach { w =>
        assert(got.get(w).contains((1L, 1.0)), s"$w -> ${got.get(w)}") }
      // the 14:00 and 18:00 events' exactly-4 hops each emitted too
      // (the final processAllAvailable flushes at wm 20:00); the 22:00
      // hops are still open, and nothing else exists
      val hops14 = Seq("13:15", "13:30", "13:45", "14:00")
        .map(m => ts(s"2024-01-01 $m:00"))
      val hops18 = Seq("17:15", "17:30", "17:45", "18:00")
        .map(m => ts(s"2024-01-01 $m:00"))
      (hops14 ++ hops18).foreach { w =>
        assert(got.get(w).contains((1L, 1.0)), s"$w -> ${got.get(w)}") }
      assert(got.keySet == (hops10 ++ hops14 ++ hops18).toSet, got.toString)
    } finally q.stop()
  }

  test("topEventsByType: GroupTopK aggregator streaming == batch") {
    // the typed mergeable aggregator must produce the identical top-k
    // under the streaming state store (incremental merges) as in one
    // batch pass — the bounded-state claim, exercised end to end
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.topEventsByType(stream, k = 5)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("topk_out")
        .as[(String, Int, Long, Double)].collect().toSet
      val batch = EventStreams.topEventsByType(Tables(spark, sf, "events"), k = 5)
        .as[(String, Int, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // every type contributes exactly k rows ranked 1..k
      streamed.groupBy(_._1).foreach { case (t, rows) =>
        assert(rows.map(_._2).toSeq.sorted == (1 to 5), t)
      }
    } finally q.stop()
  }

  test("observed metrics ride a streaming query's progress events") {
    import org.apache.spark.sql.functions._
    // the streaming face of Telemetry.observed: per-micro-batch metric
    // rows surface through StreamingQueryProgress.observedMetrics (the
    // batch-side Observation.get never fires for streams — exactly what
    // the Telemetry scaladoc directs callers to)
    val stream = EventStreams.readEventsStream(spark, sf)
    val observed = graft.ops.Telemetry.observedStream(stream,
      "stream_gate", count(lit(1)).as("rows_in"))
    val q = EventStreams.hourlyByType(observed)
      .writeStream.format("memory").queryName("obs_stream_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val totalIn = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("stream_gate")))
        .map(_.getLong(0)).sum
      val expect = Tables(spark, sf, "events").count()
      assert(totalIn == expect, s"observed $totalIn of $expect rows")
    } finally q.stop()
  }

  test("dedupAgainstStatic: stream-static anti-join == batch, stateless") {
    import org.apache.spark.sql.functions._
    // "corpus" already holds the click/view fingerprints; only the rest
    // of the stream survives ingestion
    val corpus = Seq("click", "view").toDF("event_type")
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.dedupAgainstStatic(stream, corpus, "event_type")
      .select($"event_id")
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ingest_out").as[Long].collect().toSet
      val batch = EventStreams.dedupAgainstStatic(
          Tables(spark, sf, "events"), corpus, "event_type")
        .select($"event_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // survivors really exclude every corpus-known key
      val kept = Tables(spark, sf, "events")
        .filter($"event_id".isin(streamed.toSeq.take(100): _*))
        .select($"event_type").distinct().as[String].collect().toSet
      assert(kept.intersect(Set("click", "view")).isEmpty)
    } finally q.stop()
  }

  test("hash-gated sampling is stream/batch-unified (stateless filter)") {
    import org.apache.spark.sql.functions.col
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = graft.ops.Sampling.uniform(stream, col("event_id"), 1000)
      .select($"event_id")
      .writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sample_out").as[Long].collect().toSet
      val batch = graft.ops.Sampling
        .uniform(Tables(spark, sf, "events"), col("event_id"), 1000)
        .select($"event_id").as[Long].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize: sessions end >= start and split on 30-min gaps") {
    val sessions = EventStreams.sessionize(Tables(spark, sf, "events"))
    val rows = sessions
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, s, e, n, _) => !e.before(s) && n > 0 })
    // per user, sessions don't overlap and are separated by >= 30 min
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _, _), (_, s2, _, _, _)) =>
          assert(s2.getTime - e1.getTime >= 0)
        case _ =>
      }
    }
  }

  test("streaming parquet sink: append-mode windowed agg lands on disk") {
    val out = java.nio.file.Files.createTempDirectory("stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val q = EventStreams.hourlyByType(EventStreams.readEventsStream(spark, sf))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append) // emits only watermark-closed windows
      .start()
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(out)
      // bounded input: all windows older than max(ts)-2h have closed
      assert(written.count() > 0)
      assert(written.columns.toSet ==
        Set("hour", "event_type", "n", "total_value"))
    } finally q.stop()
  }

  test("stream-stream interval join == batch join (purchase attribution)") {
    val q = EventStreams.purchaseAttribution(EventStreams.readEventsStream(spark, sf))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .select($"purchase_id", $"click_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      val batch = EventStreams.purchaseAttribution(Tables(spark, sf, "events"))
        .select($"purchase_id", $"click_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("foreachBatch sink receives every micro-batch") {
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = EventStreams.readEventsStream(spark, sf)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.addAndGet(batch.count()): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.get() == Tables(spark, sf, "events").count())
    } finally q.stop()
  }

  test("ingestDedupBatch: streamed crawls == sequential batch incremental dedup") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest_sigs").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("ingest_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.ingestDedupBatch(corpusDir, sinkDir) _)
      .start()
    try {
      // three "daily crawls": one addData + processAllAvailable per day
      // => one micro-batch per day
      (0 until 3).foreach { day =>
        val crawl = docs.filter(pmod($"doc_id", lit(3)) === day)
          .as[(Long, String)].collect().toSeq
        ms.addData(crawl: _*)
        q.processAllAvailable()
      }
      val streamed = EventStreams.ingestedDocs(spark, sinkDir)
        .select($"doc_id").as[Long].collect().toSet
      // sequential reference: the same three days through the BATCH
      // incremental-dedup primitive, corpus store accumulating
      // survivors' signatures exactly as the stream does
      var store: Option[DataFrame] = None
      val kept = scala.collection.mutable.Set[Long]()
      (0 until 3).foreach { day =>
        val crawl = docs.filter(pmod($"doc_id", lit(3)) === day)
        val sigs = Dedup.minhashSignatures(Dedup.shingles(crawl), 16)
        val hits = store match {
          case Some(c) => Dedup.corpusCollisions(sigs, c)
            .as[Long].collect().toSet
          case None => Set.empty[Long]
        }
        val surv = crawl.select($"doc_id").as[Long].collect().toSet -- hits
        kept ++= surv
        val survSigs = sigs.filter($"id".isInCollection(surv))
        store = Some(store.map(_.unionByName(survSigs)).getOrElse(survSigs)
          .localCheckpoint())
      }
      assert(streamed == kept.toSet)
      assert(streamed.nonEmpty)
      // the signature store holds exactly the survivors
      val storeIds = spark.read.option("recursiveFileLookup", "true")
        .parquet(corpusDir).select($"id").as[Long].collect().toSet
      val withSigs = Dedup.shingles(docs).select($"id").as[Long].collect().toSet
      assert(storeIds == kept.toSet.intersect(withSigs))
    } finally q.stop()
  }

  test("ingestDedupBatch soak: state stays content-bounded under redelivery") {
    // the 100 TB/day claim's untested axis (r17 verdict item 8): the
    // signature store must grow with DISTINCT CONTENT only, never with
    // stream volume. 12 micro-batches: the first two introduce fresh
    // docs, the remaining ten redeliver near-dup variants under new ids
    // — a crawler re-fetching the same pages forever. The store's row
    // count must go FLAT after the fresh content stops, and the sink
    // must keep only the originals. (MemoryStream, one addData +
    // processAllAvailable per micro-batch — deterministic batch
    // boundaries; a rate source would drive the same foreachBatch body
    // with nondeterministic batch splits.)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val base = Tables(spark, sf, "documents").select($"doc_id", $"text")
      .filter($"doc_id" < 40).as[(Long, String)].collect().toSeq
    val corpusDir = java.nio.file.Files.createTempDirectory("soak_sigs").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("soak_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("soak_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.ingestDedupBatch(corpusDir, sinkDir) _)
      .start()
    def storeRows(): Long = spark.read
      .option("recursiveFileLookup", "true").parquet(corpusDir).count()
    try {
      val sizes = scala.collection.mutable.ArrayBuffer[Long]()
      (0 until 12).foreach { b =>
        val batch =
          if (b < 2) base.filter(_._1 % 2 == b) // fresh halves
          else base.map { case (id, tx) => (id + 1000L * b, tx) } // redelivery
        ms.addData(batch: _*)
        q.processAllAvailable()
        sizes += storeRows()
      }
      assert(sizes(1) > sizes(0)) // fresh content grows the store
      // redelivery batches add NOTHING: content-bounded, not volume-bounded
      assert(sizes.drop(1).toSet.size == 1,
        s"store grew under pure redelivery: $sizes")
      // sink kept only the original ids (near-dup redeliveries dropped)
      val keptIds = EventStreams.ingestedDocs(spark, sinkDir).select($"doc_id")
        .as[Long].collect().toSet
      assert(keptIds == base.map(_._1).toSet)
    } finally q.stop()
  }

  test("ingestDedupBatch: kill + restart from checkpoint == uninterrupted run") {
    // the r18 verdict's failure-recovery gap: the soak pins state
    // boundedness, but nothing killed a query and restarted it from its
    // checkpoint. Two incarnations over a FILE source (wave 1, stop,
    // wave 2 arrives during downtime, new query object from the same
    // checkpoint) must land the exact sink content of one uninterrupted
    // query seeing the same two micro-batches — no reprocessed
    // duplicates, no lost wave, near-dup redeliveries still dropped.
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
      .filter($"doc_id" < 60).as[(Long, String)].collect().toSeq
    val wave1 = docs.filter(_._1 % 2 == 0)
    // wave 2: fresh odd docs + near-dup redeliveries of wave 1 under new ids
    val wave2 = docs.filter(_._1 % 2 == 1) ++
      wave1.map { case (id, tx) => (id + 10000L, tx) }
    def run(interrupted: Boolean): (Set[Long], Long) = {
      val src = java.nio.file.Files.createTempDirectory("rst_src").toString
      val corpusDir = java.nio.file.Files.createTempDirectory("rst_sigs").toString
      val sinkDir = java.nio.file.Files.createTempDirectory("rst_sink").toString
      val ckpt = java.nio.file.Files.createTempDirectory("rst_ckpt").toString
      def start() = spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(EventStreams.ingestDedupBatch(corpusDir, sinkDir) _)
        .start()
      wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
      if (interrupted) {
        val q1 = start(); try q1.processAllAvailable() finally q1.stop()
        wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
        val q2 = start(); try q2.processAllAvailable() finally q2.stop()
      } else {
        val q = start()
        try {
          q.processAllAvailable() // batch 0 = wave 1
          wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
          q.processAllAvailable() // batch 1 = wave 2
        } finally q.stop()
      }
      val sink = EventStreams.ingestedDocs(spark, sinkDir).select($"doc_id")
        .as[Long].collect().toSeq
      (sink.toSet, sink.length.toLong)
    }
    val (gotRestart, nRestart) = run(interrupted = true)
    val (gotStraight, nStraight) = run(interrupted = false)
    assert(gotRestart == gotStraight)
    assert(nRestart == gotRestart.size.toLong, "duplicate rows after restart")
    assert(nStraight == gotStraight.size.toLong)
    // semantics held across the restart: all originals kept, every
    // near-dup redelivery dropped
    assert(gotRestart == docs.map(_._1).toSet)
  }

  test("ingestDedupBatch: a replayed batch overwrites — no duplicates, no self-collision") {
    // foreachBatch is at-least-once: a crash between the batch body and
    // the offset commit re-runs the SAME batchId. The replay must (a)
    // not append duplicate survivors, and (b) not probe its own first
    // attempt's signatures — self-collision would drop every doc of the
    // replayed batch and overwrite both dirs with empty survivor sets.
    // Driving the body directly with a repeated batchId is exactly the
    // replay the runtime performs.
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
      .filter($"doc_id" < 40).as[(Long, String)].collect().toSeq
    val corpusDir = java.nio.file.Files.createTempDirectory("rpl_sigs").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("rpl_sink").toString
    val body = EventStreams.ingestDedupBatch(corpusDir, sinkDir) _
    val b0 = docs.filter(_._1 % 2 == 0)
    val b1 = docs.filter(_._1 % 2 == 1) ++
      b0.map { case (id, tx) => (id + 10000L, tx) } // near-dups of batch 0
    body(b0.toDF("doc_id", "text"), 0L)
    body(b1.toDF("doc_id", "text"), 1L)
    def sinkRows() = EventStreams.ingestedDocs(spark, sinkDir)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    def storeRows() = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpusDir).select($"id").as[Long].collect().toSeq.sorted
    val (sinkBefore, storeBefore) = (sinkRows(), storeRows())
    assert(sinkBefore.toSet == docs.map(_._1).toSet) // dups dropped, fresh kept
    body(b1.toDF("doc_id", "text"), 1L) // the post-crash replay
    assert(sinkRows() == sinkBefore, "replay changed the sink")
    assert(storeRows() == storeBefore, "replay changed the signature store")
  }

  test("componentsBatch: streamed edge batches == one-shot components, cross-batch merges close") {
    // dup-group maintenance as a stream: candidate edges arrive over
    // three micro-batches; the persisted state must equal the one-shot
    // closure of everything streamed, including a batch-3 edge that
    // merges two components born in DIFFERENT earlier batches (the
    // star-fold property q304 pins in batch form, here under the
    // checkpointed versioned-state discipline)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stateDir = java.nio.file.Files.createTempDirectory("cc_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = ms.toDF().toDF("d1", "d2")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.componentsBatch(stateDir) _)
      .start()
    val batches = Seq(
      Seq((1L, 2L), (5L, 6L)),
      Seq((3L, 4L), (10L, 11L)),
      Seq((2L, 3L))) // merges {1,2} with {3,4} across batch boundaries
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = EventStreams.incrementalViewState(spark, stateDir).get
      .as[(Long, Long)].collect().toMap
    val oneShot = graft.ops.Dedup.connectedComponents(
      batches.flatten.toDF("d1", "d2")).as[(Long, Long)].collect().toMap
    assert(got == oneShot)
    assert(got(4L) == 1L && got(10L) == 10L)
  }

  test("componentsBatch: kill + restart from checkpoint == one-shot components") {
    // recovery symmetry with the other two maintenance bodies: edges
    // land in batch 1, the query dies, a cross-batch merging edge
    // arrives during downtime, a new incarnation resumes — the state
    // must equal the one-shot closure with nothing refolded
    val src = java.nio.file.Files.createTempDirectory("ccr_src").toString
    val stateDir = java.nio.file.Files.createTempDirectory("ccr_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ccr_ckpt").toString
    def start() = spark.readStream.schema("d1 LONG, d2 LONG").parquet(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.componentsBatch(stateDir) _)
      .start()
    val wave1 = Seq((1L, 2L), (5L, 6L))
    val wave2 = Seq((3L, 4L), (2L, 3L)) // (2,3) merges across the restart
    wave1.toDF("d1", "d2").write.mode("append").parquet(src)
    val q1 = start(); try q1.processAllAvailable() finally q1.stop()
    wave2.toDF("d1", "d2").write.mode("append").parquet(src)
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    val got = EventStreams.incrementalViewState(spark, stateDir).get
      .as[(Long, Long)].collect().toMap
    val oneShot = graft.ops.Dedup.connectedComponents(
      (wave1 ++ wave2).toDF("d1", "d2")).as[(Long, Long)].collect().toMap
    assert(got == oneShot)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("incrementalJoinViewBatch: kill + restart from checkpoint == full recompute") {
    // same recovery contract for the versioned-state view: batch 0
    // lands, the query dies, the remaining facts arrive during
    // downtime, a new incarnation resumes from the checkpoint — the
    // finished view must equal the one-shot recompute over everything,
    // with history never refolded (the replay guard plus offset resume)
    import org.apache.spark.sql.functions._
    import graft.ops.Incremental
    val src = java.nio.file.Files.createTempDirectory("rstiv_src").toString
    val stateDir = java.nio.file.Files.createTempDirectory("rstiv_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rstiv_ckpt").toString
    val dim = Tables(spark, sf, "customer").select($"c_custkey", $"c_mktsegment")
    val orders = Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSeq
    def start() = spark.readStream
      .schema("o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE")
      .parquet(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.incrementalJoinViewBatch(
        dim, "o_custkey", "c_custkey", "c_mktsegment", "o_totalprice", stateDir) _)
      .start()
    orders.filter(_._1 % 2 == 0).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("append").parquet(src)
    val q1 = start(); try q1.processAllAvailable() finally q1.stop()
    orders.filter(_._1 % 2 == 1).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("append").parquet(src)
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    val got = Incremental.finish(
        EventStreams.incrementalViewState(spark, stateDir).get)
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val want = Incremental.finish(Incremental.merge(Seq(Incremental.partial(
        Tables(spark, sf, "orders").join(dim, $"o_custkey" === $"c_custkey"),
        $"c_mktsegment", $"o_totalprice"))))
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case (g, w) =>
      assert(g._2 == w._2 && g._4 == w._4 && g._5 == w._5, s"$g vs $w")
      assert(math.abs(g._3 - w._3) < 1e-6 && math.abs(g._6 - w._6) < 1e-9,
        s"$g vs $w")
    }
  }

  test("incrementalJoinViewBatch: 3 streamed fact batches == one full recompute") {
    // the q178 maintenance claim closed into the streaming family: the
    // orders fact arrives as three micro-batches, each folded against
    // the broadcast customer dim into versioned on-disk state; the
    // finished view must equal the full-join recompute — history never
    // rescanned, stream == batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.ops.Incremental
    val stateDir = java.nio.file.Files.createTempDirectory("iv_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("iv_ckpt").toString
    val dim = Tables(spark, sf, "customer").select($"c_custkey", $"c_mktsegment")
    val orders = Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Double)]
    val q = ms.toDF().toDF("o_orderkey", "o_custkey", "o_totalprice")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.incrementalJoinViewBatch(
        dim, "o_custkey", "c_custkey", "c_mktsegment", "o_totalprice", stateDir) _)
      .start()
    try {
      (0 until 3).foreach { b =>
        ms.addData(orders.filter(_._1 % 3 == b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the final version plus its predecessor survive (the one-batch
    // reader grace window); everything older is pruned
    val vdirs = new java.io.File(stateDir).listFiles().filter(_.getName.startsWith("v"))
      .map(_.getName).sorted.toSeq
    assert(vdirs == Seq("v1", "v2"), vdirs.toString)
    val got = Incremental.finish(
        EventStreams.incrementalViewState(spark, stateDir).get)
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val want = Incremental.finish(Incremental.merge(Seq(Incremental.partial(
        Tables(spark, sf, "orders").join(dim, $"o_custkey" === $"c_custkey"),
        $"c_mktsegment", $"o_totalprice"))))
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case (g, w) =>
      assert(g._2 == w._2 && g._4 == w._4 && g._5 == w._5, s"$g vs $w")
      // sums/means reassociate across batch folds — float tolerance
      assert(math.abs(g._3 - w._3) < 1e-6 && math.abs(g._6 - w._6) < 1e-9,
        s"$g vs $w")
    }
  }

  test("ksDriftBatch: accumulated stream KS == batch KS over the full history") {
    // the drift monitor's exactness claim: per-(group, value) counts
    // are mergeable integer sums, so three micro-batches folded into
    // the state table yield BIT-IDENTICAL KS verdicts to the one-shot
    // batch statistic over baseline ∪ stream — stream == batch, no
    // approximation anywhere
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.ops.Drift
    val stateDir = java.nio.file.Files.createTempDirectory("ks_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ks_ckpt").toString
    // floor-quantized value — exact KS is for discrete/binned columns
    val ev = Tables(spark, sf, "events")
      .select($"event_id", $"event_type", floor($"value").cast("long").as("x"))
    val baseRows = ev.filter($"event_id" % 2 === 0) // the frozen snapshot
    val curRows = ev.filter($"event_id" % 2 === 1)  // arrives as a stream
    val baseline = Drift.valueCounts(baseRows, $"event_type", $"x")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val q = ms.toDF().toDF("event_id", "event_type", "x")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.ksDriftBatch("event_type", "x", stateDir) _)
      .start()
    val rows = curRows.as[(Long, String, Long)].collect().toSeq
    try {
      (0 until 3).foreach { b =>
        ms.addData(rows.filter(_._1 % 3 == b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = EventStreams.ksDriftCurrent(spark, stateDir, baseline).get
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    val want = Drift.ksStatistic(
        baseRows.withColumn("b", lit(false))
          .unionByName(curRows.withColumn("b", lit(true))),
        $"event_type", $"x", $"b")
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(r => r._2 > 0 && r._3 > 0))
    // W1 reads the SAME state table — one maintenance stream, two gates
    val gotW1 = EventStreams.w1DriftCurrent(spark, stateDir, baseline).get
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    val wantW1 = Drift.w1Statistic(
        baseRows.withColumn("b", lit(false))
          .unionByName(curRows.withColumn("b", lit(true))),
        $"event_type", $"x", $"b")
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    assert(gotW1 == wantW1)
    // chi2 completes the trio off the same state
    val gotChi = EventStreams.chi2DriftCurrent(spark, stateDir, baseline).get
      .orderBy("g").as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    val wantChi = Drift.chi2Statistic(
        baseRows.withColumn("b", lit(false))
          .unionByName(curRows.withColumn("b", lit(true))),
        $"event_type", $"x", $"b")
      .orderBy("g").as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(gotChi == wantChi)
  }

  test("incrementalJoinViewBatch: marker-less partial version dir is replayed, not trusted") {
    // the crash-mid-write contract: the parquet committer creates v<id>
    // BEFORE the job commits, so a v<id> without its _SUCCESS marker
    // must read as never-written — the replayed batch re-runs its merge
    // (instead of being skipped, silently losing its rows) and the
    // reader never consumes the partial files as state
    import org.apache.spark.sql.functions._
    import graft.ops.Incremental
    val stateDir = java.nio.file.Files.createTempDirectory("iv_crash").toString
    val dim = Tables(spark, sf, "customer").select($"c_custkey", $"c_mktsegment")
    val orders = Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val b0 = orders.filter($"o_orderkey" % 2 === 0)
    val b1 = orders.filter($"o_orderkey" % 2 === 1)
    val body = EventStreams.incrementalJoinViewBatch(
      dim, "o_custkey", "c_custkey", "c_mktsegment", "o_totalprice", stateDir) _
    body(b0, 0L)
    // simulate the crash: batch 1's attempt wrote real part files into
    // v1 but died before commit — drop the marker it would have written
    val v1 = new java.io.File(stateDir, "v1")
    Incremental.partial(
        b1.limit(5).join(dim, $"o_custkey" === $"c_custkey"),
        $"c_mktsegment", $"o_totalprice")
      .write.parquet(v1.toString)
    assert(new java.io.File(v1, "_SUCCESS").delete())
    // the reader takes the highest COMMITTED version — still batch 0's
    val stateCnt = EventStreams.incrementalViewState(spark, stateDir).get
      .agg(sum($"cnt")).as[Long].head()
    assert(stateCnt == b0.count())
    // the replay must RE-RUN batch 1 over the committed v0 state and
    // land the correct final view (== full recompute), replacing the
    // partial dir wholesale
    body(b1, 1L)
    val got = Incremental.finish(
        EventStreams.incrementalViewState(spark, stateDir).get)
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val want = Incremental.finish(Incremental.merge(Seq(Incremental.partial(
        orders.join(dim, $"o_custkey" === $"c_custkey"),
        $"c_mktsegment", $"o_totalprice"))))
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._4, t._5)) ==
      want.map(t => (t._1, t._2, t._4, t._5)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-6, s"$g vs $w")
    }
    // prune keeps the new version PLUS the committed version it
    // superseded (the one-batch reader grace window); the crashed
    // partial is gone
    val vdirs = new java.io.File(stateDir).listFiles().filter(_.getName.startsWith("v"))
      .map(_.getName).sorted.toSeq
    assert(vdirs == Seq("v0", "v1"), vdirs)
    // the grace window ROLLS: the next commit finally drops v0 while
    // leaving v1 for its own grace batch — and an empty batch is a
    // correct no-op merge (state unchanged)
    body(b1.limit(0), 2L)
    val vdirs2 = new java.io.File(stateDir).listFiles().filter(_.getName.startsWith("v"))
      .map(_.getName).sorted.toSeq
    assert(vdirs2 == Seq("v1", "v2"), vdirs2)
    val got2 = Incremental.finish(
        EventStreams.incrementalViewState(spark, stateDir).get)
      .orderBy("key")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got2.map(t => (t._1, t._2, t._4, t._5)) ==
      want.map(t => (t._1, t._2, t._4, t._5)))
  }

  test("retractionViewBatch: streamed CDC + flagged rebuild == full live recompute") {
    // the round-trip of the whole retraction story in stream form:
    // inserts arrive as three micro-batches, deletes as two more (one
    // of them deliberately retracting every type's MAXIMUM so a
    // needs_rebuild flag is guaranteed per key, not left to data
    // chance), the persisted delta state stays exact on count/sum/mean
    // throughout, and one rebuildFlagged pass against the live rows
    // lands the view on the from-scratch recompute with all flags clear
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.ops.Incremental
    val stateDir = java.nio.file.Files.createTempDirectory("rv_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rv_ckpt").toString
    val ev = Tables(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
    val rows = ev.as[(Long, String, Option[Double])].collect().toSeq
    val del7 = rows.filter(_._1 % 7 == 0).map(_._1).toSet
    val maxIds = rows.filter(_._3.isDefined).groupBy(_._2).values
      .map(rs => rs.maxBy(r => (r._3.get, r._1))._1).toSet
    val delIds = del7 ++ maxIds
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Option[Double], Long)]
    val q = ms.toDF().toDF("event_id", "event_type", "value", "w")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.retractionViewBatch(
        "event_type", "value", "w", stateDir) _)
      .start()
    try {
      (0 until 3).foreach { b =>
        ms.addData(rows.filter(_._1 % 3 == b).map(r => (r._1, r._2, r._3, 1L)): _*)
        q.processAllAvailable()
      }
      ms.addData(rows.filter(r => del7(r._1)).map(r => (r._1, r._2, r._3, -1L)): _*)
      q.processAllAvailable()
      ms.addData(rows.filter(r => maxIds(r._1) && !del7(r._1))
        .map(r => (r._1, r._2, r._3, -1L)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val state = EventStreams.incrementalViewState(spark, stateDir).get
    // every type's max was retracted -> every type must be flagged
    val flags = Incremental.finishDelta(state).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("needs_rebuild")).toMap
    assert(flags.nonEmpty && flags.values.forall(identity), flags.toString)
    // one flagged-keys rebuild against the live rows == full recompute
    val live = ev.filter(!$"event_id".isin(delIds.toSeq: _*))
    val fin = Incremental.finishDelta(
        Incremental.rebuildFlagged(state, live, $"event_type", $"value"))
      .orderBy("key").collect()
    val want = live.groupBy($"event_type".as("key"))
      .agg(count($"value").as("cnt"), sum($"value").as("sum"),
        min($"value").as("vmin"), max($"value").as("vmax"),
        avg($"value").as("mean"))
      .orderBy("key").collect()
    assert(fin.length == want.length && fin.nonEmpty)
    fin.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1))                       // cnt exact
      assert(g.getDouble(3) == w.getDouble(3), s"vmin ${g.toSeq}") // rebuilt min exact
      assert(g.getDouble(4) == w.getDouble(4), s"vmax ${g.toSeq}") // rebuilt max exact
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-6)     // sum: fold jitter
      assert(math.abs(g.getDouble(5) - w.getDouble(5)) < 1e-9)     // mean
      assert(!g.getAs[Boolean]("needs_rebuild"))
    }
  }

  test("Trigger.AvailableNow drains the source then STOPS; restart is a no-op") {
    // the backfill/operational face: AvailableNow processes everything
    // available at start, then terminates on its own — the batch-shaped
    // way to run a streaming pipeline on a schedule. Restarting against
    // the same checkpoint with no new data must terminate without
    // emitting anything (exactly-once across restarts).
    // the pinned op is the streaming dedup (emits on arrival, so the
    // drained output is complete — a windowed agg would legitimately
    // hold back the final watermark horizon in append mode)
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("an_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("an_ckpt").toString
    def run(): Unit = {
      val stream = EventStreams.readEventsStream(spark, sf)
        .select(col("user_id"), col("event_type"), col("ts"))
      val q = EventStreams.dedupStream(stream, Seq("user_id", "event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    }
    run()
    val n1 = spark.read.parquet(out).count()
    val exact = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts")).distinct().count()
    assert(n1 == exact)
    run() // same checkpoint, no new files: terminates, adds nothing
    assert(spark.read.parquet(out).count() == n1)
  }

  test("quality model scores a document STREAM identically to batch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // fit once on the batch corpus, then score the same docs arriving as
    // a file stream — the "score the crawl as it lands" deployment: LR
    // scoring is a scan-side projection, so the streaming plan is the
    // batch plan with a streaming source, no state at all
    val docs = Tables(spark, sf, "documents")
    val model = graft.pipelines.QualityClassifier.fit(docs)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    val q = graft.pipelines.QualityClassifier.score(stream, model)
      .writeStream.format("memory").queryName("quality_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("quality_out")
        .select($"doc_id", $"label", round($"prob", 9), $"pred")
        .as[(Long, Double, Double, Double)].collect().toSet
      val batch = graft.pipelines.QualityClassifier.score(docs, model)
        .select($"doc_id", $"label", round($"prob", 9), $"pred")
        .as[(Long, Double, Double, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize stream: late in-horizon event MERGES two open sessions == batch") {
    // the session_window state-merge path: 10:00 and 10:50 open two
    // separate sessions (gap 50min > 30min); a LATE 10:20 arrival
    // inside the watermark horizon bridges them — the store must merge
    // both open sessions plus the new event into ONE [10:00, 11:20)
    // session, emitted once the watermark passes its end; batch over
    // the same rows must agree exactly
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val cols = Seq("ts", "user_id", "value")
    val q = EventStreams.sessionize(ms.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("sess_merge_out")
      .outputMode(OutputMode.Append).start()
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, Long, Double)]
    try {
      def step(rows: (java.sql.Timestamp, Long, Double)*): Unit = {
        all ++= rows; ms.addData(rows: _*); q.processAllAvailable()
      }
      step((ts("2024-01-01 10:00:00"), 1L, 1.0),
           (ts("2024-01-01 10:50:00"), 1L, 2.0)) // two open sessions
      step((ts("2024-01-01 10:20:00"), 1L, 4.0)) // late bridge event
      step((ts("2024-01-01 20:00:00"), 2L, 8.0)) // advance wm past close
      step((ts("2024-01-02 02:00:00"), 2L, 0.5)) // wm tick to flush user 1
      val streamed = spark.table("sess_merge_out")
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"session_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSet
      // exactly ONE merged session for user 1: [10:00, 11:20), 3 events
      val u1 = streamed.filter(_._1 == 1L)
      assert(u1 == Set((1L, ts("2024-01-01 10:00:00"),
        ts("2024-01-01 11:20:00"), 3L, 7.0)), streamed.toString)
      val batch = EventStreams.sessionize(all.toSeq.toDF(cols: _*))
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"session_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().toSet
      assert(batch.filter(_._1 == 1L) == u1) // closed sessions agree
    } finally q.stop()
  }

  test("outer purchase attribution: unmatched purchase emits null row after watermark") {
    // stream face: an attributed purchase emits immediately; a purchase
    // with NO click in its preceding hour may only emit (with null
    // click_ts) once the watermark proves no matching click can still
    // arrive — then both must equal the batch left join over the same
    // rows
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.purchaseAttributionOuter(
        ms.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append).start()
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(Long, java.sql.Timestamp, Long, String, Double)]
    try {
      def step(rows: (Long, java.sql.Timestamp, Long, String, Double)*): Unit = {
        all ++= rows; ms.addData(rows: _*); q.processAllAvailable()
      }
      step((1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
           (2L, ts("2024-01-01 10:30:00"), 7L, "purchase", 5.0), // attributed
           (3L, ts("2024-01-01 10:40:00"), 8L, "purchase", 9.0)) // organic
      // advance the watermark past purchase 3's join window. BOTH event
      // types must keep flowing: each side's watermark node sits below
      // its type filter (see the op's scaladoc), so click-only traffic
      // would freeze the purchases-side watermark and with it the
      // global min — pinned here by construction: the advancing batches
      // are attributed click+purchase pairs
      step((4L, ts("2024-01-02 00:00:00"), 9L, "click", 0.0),
           (5L, ts("2024-01-02 00:10:00"), 9L, "purchase", 1.0))
      step((6L, ts("2024-01-02 06:00:00"), 9L, "click", 0.0),
           (7L, ts("2024-01-02 06:10:00"), 9L, "purchase", 2.0))
      step((8L, ts("2024-01-02 12:00:00"), 9L, "click", 0.0),
           (9L, ts("2024-01-02 12:10:00"), 9L, "purchase", 3.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_outer_out")
        .select($"purchase_id", $"user_id", $"click_ts".isNull, $"value")
        .as[(Long, Long, Boolean, Double)].collect().toSet
      assert(streamed == Set((2L, 7L, false, 5.0), (3L, 8L, true, 9.0),
        (5L, 9L, false, 1.0), (7L, 9L, false, 2.0), (9L, 9L, false, 3.0)),
        streamed.toString)
      val batch = EventStreams.purchaseAttributionOuter(all.toSeq.toDF(cols: _*))
        .select($"purchase_id", $"user_id", $"click_ts".isNull, $"value")
        .as[(Long, Long, Boolean, Double)].collect().toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("checkpointed restart resumes from offsets — each row lands exactly once") {
    // the recovery contract a 100 TB/day ingest leans on: a stream is
    // stopped (crash, deploy) and a NEW query object restarts from the
    // same checkpoint — already-committed source files must not be
    // reprocessed (no duplicates in the sink), files arriving while
    // down must be picked up
    val src = java.nio.file.Files.createTempDirectory("restart_src").toString
    val sink = java.nio.file.Files.createTempDirectory("restart_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("restart_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG, v DOUBLE").parquet(src)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").write.mode("append").parquet(src)
    runOnce()
    // downtime: a new file arrives between the two query incarnations
    Seq((3L, 3.0)).toDF("id", "v").write.mode("append").parquet(src)
    runOnce()
    val got = spark.read.parquet(sink).as[(Long, Double)].collect()
    assert(got.length == 3, got.toSeq.toString) // no reprocessed duplicates
    assert(got.toSet == Set((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("dedupExactlyOnce: in-horizon redeliveries drop, first delivery wins") {
    // the at-least-once retry shape: a key redelivered in a LATER
    // micro-batch, with a perturbed payload and timestamp, still inside
    // the watermark horizon — state is per bare key, so it dedups; a
    // fresh key passes; batch face over exact copies collapses to the
    // original rows
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = EventStreams.dedupExactlyOnce(
        ms.toDF().toDF("event_id", "ts", "value"), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_once_out")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00"), 1.0)); q.processAllAvailable()
      // redelivery of key 1: later batch, different ts AND value
      ms.addData((1L, ts("2024-01-01 10:30:00"), 9.9),
        (2L, ts("2024-01-01 10:31:00"), 2.0)); q.processAllAvailable()
      val got = spark.table("dedup_once_out")
        .as[(Long, java.sql.Timestamp, Double)].collect().toSet
      assert(got == Set((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:31:00"), 2.0)), got.toString)
      // batch face: exact-copy duplicates collapse to the distinct rows
      val batch = EventStreams.dedupExactlyOnce(
        Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
          (1L, ts("2024-01-01 10:00:00"), 1.0),
          (2L, ts("2024-01-01 10:31:00"), 2.0))
          .toDF("event_id", "ts", "value"), Seq("event_id"))
        .as[(Long, java.sql.Timestamp, Double)].collect().toSet
      assert(batch == Set((1L, ts("2024-01-01 10:00:00"), 1.0),
        (2L, ts("2024-01-01 10:31:00"), 2.0)))
    } finally q.stop()
  }

  test("sessionFunnels: EventTimeTimeout stateful op, out-of-order stream == batch") {
    // The q166 operator's streaming face: events arrive OUT OF ORDER
    // within the 2h watermark horizon (user 1's purchase lands a batch
    // before its click), the state buffer reorders by event time, and
    // sessions emit either on-data or via the state TIMEOUT once the
    // watermark passes session_end + gap. The batch face (NoTimeout,
    // full history per group) over the same rows must agree exactly on
    // every closed session.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = EventStreams.sessionFunnels(
        ms.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, Long, String)]
    try {
      def step(rows: (java.sql.Timestamp, Long, String)*): Unit = {
        all ++= rows; ms.addData(rows: _*); q.processAllAvailable()
      }
      // user 1: funnel events arrive out of arrival-order (purchase
      // first); user 2: click BEFORE view in event time -> no funnel
      step((ts("2024-01-01 10:00:00"), 1L, "view"),
           (ts("2024-01-01 10:20:00"), 1L, "purchase"))
      step((ts("2024-01-01 10:10:00"), 1L, "click"),
           (ts("2024-01-01 09:50:00"), 2L, "click"),
           (ts("2024-01-01 10:00:00"), 2L, "view"))
      // 16:00 advances wm to 14:00 > both sessions' close (+gap) ->
      // users 1/2 emit (no-data batch fires their timeouts)
      step((ts("2024-01-01 16:00:00"), 99L, "view"))
      // 23:00 -> wm 21:00 > 17:00 fires user 99's TIMEOUT (no new data
      // for that key — emission is purely timeout-driven)
      step((ts("2024-01-01 23:00:00"), 3L, "view"))
      step((ts("2024-01-01 23:05:00"), 3L, "view")) // extra wm tick
      val streamed = spark.table("sessions_out")
        .as[EventStreams.SessionSummary].collect().toSet
      val closedUsers = streamed.map(_.user_id)
      assert(closedUsers == Set(1L, 2L, 99L), streamed.toString)
      // user 3's session is still open (wm hasn't passed 23:05 + gap)
      // batch face over the identical rows: closed sessions must match
      val batch = EventStreams.sessionFunnels(
          all.toSeq.toDF("ts", "user_id", "event_type"))
        .collect().toSet
      assert(batch.filter(s => closedUsers(s.user_id)) == streamed)
      assert(streamed.find(_.user_id == 1L).exists(_.has_funnel))
      assert(streamed.find(_.user_id == 2L).exists(!_.has_funnel))
    } finally q.stop()
  }

  test("runningTotalsTws: transformWithState accumulates across batches (RocksDB store)") {
    // the Spark 4 stateful API face: same semantics as runningTotals,
    // typed ValueState handle + TTL config; streaming execution rides
    // the RocksDB provider (the 100 TB-right store — disk-backed state
    // with changelog checkpoints, not executor heap)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStreams.EventRow
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    val q = EventStreams.runningTotalsTws(ms.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").option("checkpointLocation", ckpt)
      .start()
    try {
      ms.addData(EventRow(1, 10, "view", 1.0), EventRow(2, 10, "click", 2.0),
        EventRow(3, 20, "view", 5.0))
      q.processAllAvailable()
      ms.addData(EventRow(4, 10, "purchase", 3.0), EventRow(5, 20, "view", 1.5))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    // the LAST emission per user carries the cross-batch running total
    import org.apache.spark.sql.functions.max
    val finals = spark.table("tws_out")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"total_value").as("tot"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finals(10L) == ((3L, 6.0)))
    assert(finals(20L) == ((2L, 6.5)))
  }

  test("state data source: checkpointed aggregation state reads back as a DataFrame") {
    // Spark 4's statestore format — the operational window every
    // production stream needs: inspect WHAT the engine is holding
    // (per-key aggregation state, its size, its skew) without stopping
    // the query or spelunking binary checkpoint files. Pin that the
    // windowed-count state read back from the checkpoint equals what
    // the stream has emitted — i.e. the store is a queryable table,
    // not a black box.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val ckpt = java.nio.file.Files.createTempDirectory("ssr_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyByType(events)
      .writeStream.format("memory").queryName("ssr_out")
      .outputMode("complete").option("checkpointLocation", ckpt)
      .start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      ms.addData((t(1, 10), "view", 1.0), (t(1, 20), "view", 2.0),
        (t(1, 30), "click", 5.0), (t(2, 5), "view", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // the state store holds the (window, event_type) aggregation rows
    val state = spark.read.format("statestore")
      .option("path", ckpt)
      .load()
    // the value struct carries the AGGREGATION BUFFER fields (count,
    // sum) — the partial state, not the output aliases; that is
    // exactly the "what is the engine holding" view this source exists
    // to expose
    val got = state
      .select(col("key.window.start").cast("string").as("w"),
        col("key.event_type").as("et"),
        col("value.count").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("2024-01-01 01:00:00", "view")) == 2L)
    assert(got(("2024-01-01 01:00:00", "click")) == 1L)
    assert(got(("2024-01-01 02:00:00", "view")) == 1L)
  }

  test("wquantileBatch: accumulated frozen-grid state == the batch quantile") {
    // the weighted-quantile monitor in stream form: three micro-batches
    // fold frozen-grid bin weights into versioned state; the read-back
    // band must equal (a) quantileFromCounts over a one-shot global
    // binCounts AND (b) the batch face quantileBinned when the frozen
    // grid is the data-fit [min, max] grid — i.e. streaming buys
    // incrementality, not different answers
    import org.apache.spark.sql.functions._
    import graft.ops.WeightedQuantile
    val stateDir = java.nio.file.Files.createTempDirectory("wq_state").toString
    val li = Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_returnflag", $"l_extendedprice", $"l_quantity")
    val (lo, hi) = li.agg(min($"l_extendedprice".cast("double")),
      max($"l_extendedprice".cast("double"))).as[(Double, Double)].head()
    val bins = 64
    val body = EventStreams.wquantileBatch("l_returnflag", "l_extendedprice",
      "l_quantity", lo, hi, bins, stateDir) _
    (0 to 2).foreach(i => body(li.filter(pmod($"l_orderkey", lit(3)) === i), i.toLong))
    val got = EventStreams.wquantileCurrent(spark, stateDir, lo, hi, bins).get
      .orderBy($"g")
      .as[(String, Long, Long, Int, Double, Double, Long)].collect().toSeq
    val oneShot = WeightedQuantile.quantileFromCounts(
        WeightedQuantile.binCounts(li, $"l_returnflag", $"l_extendedprice",
          $"l_quantity", lo, hi, bins), lo, hi, bins)
      .orderBy($"g")
      .as[(String, Long, Long, Int, Double, Double, Long)].collect().toSeq
    assert(got.nonEmpty && got == oneShot)
    // (b) on a SINGLE-group frame the frozen [min, max] grid IS the
    // data-fit grid, so frozen-grid reads must agree with the batch
    // face's crossing bin and weights (quantileBinned fits per-group
    // bounds, so the equivalence only holds group-by-group)
    val one = li.filter($"l_returnflag" === "A")
    val (lo1, hi1) = one.agg(min($"l_extendedprice".cast("double")),
      max($"l_extendedprice".cast("double"))).as[(Double, Double)].head()
    val frozen = WeightedQuantile.quantileFromCounts(
        WeightedQuantile.binCounts(one, $"l_returnflag", $"l_extendedprice",
          $"l_quantity", lo1, hi1, bins), lo1, hi1, bins)
      .as[(String, Long, Long, Int, Double, Double, Long)].head()
    val fit = WeightedQuantile.quantileBinned(one, $"l_returnflag",
        $"l_extendedprice", $"l_quantity", bins)
      .as[(String, Long, Long, Int, Double, Double, Long)].head()
    assert((frozen._1, frozen._2, frozen._4, frozen._7) ==
      ((fit._1, fit._2, fit._4, fit._7)), s"$frozen vs $fit")
    assert(math.abs(frozen._5 - fit._5) < 1e-9 && math.abs(frozen._6 - fit._6) < 1e-9)
  }

  test("calibrationBatch: accumulated bin state == one-shot reliability + Brier") {
    // the calibration monitor in stream form: scored rows arrive in
    // three micro-batches; the derived reliability/Brier views of the
    // accumulated state must equal the one-shot batch computation —
    // integer columns exactly, the order-exposed double sums within
    // ulp of the 6dp round
    import org.apache.spark.sql.functions._
    import graft.ops.Calibration
    val stateDir = java.nio.file.Files.createTempDirectory("cal_state").toString
    // deterministic scored frame: p from a hash, weak label correlated
    val scored = Tables(spark, sf, "documents")
      .select($"doc_id",
        (pmod(graft.ops.Portable.p60($"doc_id".cast("string")), lit(1000))
          .cast("double") / 1000.0).as("p"))
      .withColumn("y", ($"p" > 0.45).cast("long"))
    val body = EventStreams.calibrationBatch("p", "y", 10, stateDir) _
    (0 to 2).foreach(i => body(scored.filter(pmod($"doc_id", lit(3)) === i), i.toLong))
    val (relS, brS) = EventStreams.calibrationCurrent(spark, stateDir).get
    val got = relS.orderBy($"bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    val want = Calibration.reliability(scored, $"p", $"y").orderBy($"bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 2e-6 && math.abs(g._5 - w._5) < 2e-6,
        s"$g vs $w")
    }
    val gotB = brS.as[(Long, Double)].head()
    val wantB = Calibration.brier(scored, $"p", $"y").as[(Long, Double)].head()
    assert(gotB._1 == wantB._1 && math.abs(gotB._2 - wantB._2) < 2e-6)
    // third derived monitor off the SAME state: the PR curve's counts
    // are pure integer suffix sums, so stream == batch EXACTLY
    // (q245's contract) — no tolerance needed on any column
    val gotPr = EventStreams.prCurveCurrent(spark, stateDir).get
      .orderBy($"threshold")
      .as[(Double, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    val wantPr = Calibration.prCurveFromState(
        Calibration.binState(scored, $"p", $"y")).orderBy($"threshold")
      .as[(Double, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(gotPr == wantPr)
    assert(gotPr.map(_._2).reverse == gotPr.map(_._2).reverse.sorted,
      "TP must be non-increasing in threshold")
  }

  test("mixtureBatch: accumulated token counts == one-shot mixture " +
    "reweight (q313), exactly") {
    // the corpus-mixture monitor in stream form: documents ingest in
    // three micro-batches; the DoReMi reweight read off the
    // accumulated (source, token) count state must equal the one-shot
    // batch op BYTE-IDENTICALLY — the counts are the read's sufficient
    // statistic (exact integer merges), and the read path is the same
    // defined-order fold, so not even the doubles may differ
    import org.apache.spark.sql.functions._
    val stateDir = java.nio.file.Files.createTempDirectory("mix_state").toString
    val docs = Tables(spark, sf, "documents")
    val body = EventStreams.mixtureBatch("source", "text", stateDir) _
    (0 to 2).foreach(i =>
      body(docs.filter(pmod($"doc_id", lit(3)) === i), i.toLong))
    val got = EventStreams.mixtureCurrent(spark, stateDir).get
      .orderBy($"source")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val want = graft.ops.Sampling.mixtureReweight(docs, $"source", $"text")
      .orderBy($"source")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty && got == want)
    // the weights remain a probability vector after accumulation
    val wsum = got.map(_._5).sum
    assert(math.abs(wsum - 1.0) <= got.size * 5e-7, s"weights sum $wsum")
  }

  test("banditBatch: accumulated arm counts == one-shot UCB allocation " +
    "(q335), exactly") {
    // the bandit monitor in stream form: events ingest in three
    // micro-batches; the UCB1 allocation read off the accumulated
    // per-arm (pulls, successes) state must equal the one-shot q335
    // batch BYTE-identically — the counts are the rule's sufficient
    // statistic (exact-long merges) and the read is the shared
    // Stats.ucbFromCounts, so not even the doubles may differ
    import org.apache.spark.sql.functions._
    val stateDir =
      java.nio.file.Files.createTempDirectory("bandit_state").toString
    val ev = Tables(spark, sf, "events")
    val body = EventStreams.banditBatch(expr("hour(ts) DIV 6"),
      $"event_type" === "purchase", stateDir) _
    (0 to 2).foreach(i =>
      body(ev.filter(pmod($"event_id", lit(3)) === i), i.toLong))
    val got = EventStreams.ucbCurrent(spark, stateDir).get
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSeq
    val want = SparkEntry.queries("q335_ucb_allocation")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSeq
    assert(got.nonEmpty && got == want)
    // exactly one chosen arm survives accumulation
    assert(got.count(_._6 == 1L) == 1)
  }

  test("gramBatch: accumulated Gram state == one-shot anisotropy " +
    "(q338), exactly") {
    // the embedding-collapse monitor in stream form: vectors ingest in
    // three micro-batches; the eigen read off the accumulated integer
    // Gram/sum/count state must equal the one-shot q338 batch
    // BYTE-identically — all 64 loadings included, because the state
    // is exact longs and the read is the same fixed double program
    import org.apache.spark.sql.functions._
    val stateDir =
      java.nio.file.Files.createTempDirectory("gram_state").toString
    val emb = Tables(spark, sf, "embeddings")
    val body = EventStreams.gramBatch("embedding", stateDir) _
    (0 to 2).foreach(i =>
      body(emb.filter(pmod($"vec_id", lit(3)) === i), i.toLong))
    val got = EventStreams.anisotropyCurrent(spark, stateDir).get
      .as[(Long, Double, Double, Double, Option[Double])].collect().toSeq
    val want = SparkEntry.queries("q338_embedding_anisotropy")(spark, sf)
      .as[(Long, Double, Double, Double, Option[Double])].collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("gramBatch: an empty first micro-batch reads as empty, then recovers") {
    // a monitor's first micro-batch can legitimately be empty (late
    // watermark, filtered ingest); the current view must read as an
    // empty frame — not crash on the missing count key — and a later
    // non-empty batch must fold in as if the empty one never happened
    import org.apache.spark.sql.functions._
    val stateDir =
      java.nio.file.Files.createTempDirectory("gram_empty").toString
    val emb = Tables(spark, sf, "embeddings")
    val body = EventStreams.gramBatch("embedding", stateDir) _
    body(emb.filter(lit(false)), 0L)
    val afterEmpty = EventStreams.anisotropyCurrent(spark, stateDir).get
    assert(afterEmpty.count() == 0L)
    body(emb, 1L)
    val got = EventStreams.anisotropyCurrent(spark, stateDir).get
      .as[(Long, Double, Double, Double, Option[Double])].collect().toSeq
    val want = SparkEntry.queries("q338_embedding_anisotropy")(spark, sf)
      .as[(Long, Double, Double, Double, Option[Double])].collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("survivalBatch: accumulated duration histogram == one-shot Kaplan-Meier") {
    // the survival monitor in stream form: subjects resolve in three
    // micro-batches; the curve derived from the accumulated (t, cnt, d)
    // state must equal the one-shot computation EXACTLY — every state
    // column is an integer, so no tolerance (unlike calibration's
    // double sums)
    import org.apache.spark.sql.functions._
    val stateDir = java.nio.file.Files.createTempDirectory("surv_state").toString
    val subjects = Tables(spark, sf, "events")
      .filter($"user_id".isNotNull)
      .groupBy($"user_id")
      .agg((pmod(graft.ops.Portable.p60(min($"ts").cast("string")), lit(73)))
        .as("t"),
        (pmod($"user_id", lit(3)) =!= 0).as("event"))
    val body = EventStreams.survivalBatch("t", "event", stateDir) _
    (0 to 2).foreach(i =>
      body(subjects.filter(pmod($"user_id", lit(3)) === i), i.toLong))
    val got = EventStreams.survivalCurrent(spark, stateDir).get
      .orderBy($"t").as[(Long, Long, Long, Long, Double)].collect().toSeq
    val want = graft.ops.Survival.kaplanMeier(subjects, $"t", $"event")
      .orderBy($"t").as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // survival is non-increasing in t
    assert(got.map(_._5).reverse == got.map(_._5).reverse.sorted)
  }

  test("runningTotals: stateful op accumulates per-user counts") {
    val events = Tables(spark, sf, "events")
      .selectExpr("event_id", "user_id", "event_type", "value")
      .as[EventStreams.EventRow]
    val totals = EventStreams.runningTotals(events).collect()
    val expected = events.groupByKey(_.user_id).count().collect().toMap
    assert(totals.nonEmpty)
    // batch run: one state update per user holding the full count
    totals.foreach(t => assert(t.n_events == expected(t.user_id)))
  }
}
