package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Portable}
import graft.queries.Tables

/** Content-defined chunking invariants: chunks tile each document
  * exactly, boundaries are shift-resistant (the property that makes CDC
  * find shared passages at different offsets), and the dedup query's
  * plan stays scan-side until the single fingerprint exchange. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunks tile every document: sum(n_tok) == token count, fps non-null") {
    val docs = Tables(spark, sf, "documents")
    val perDoc = Dedup.cdcChunks(docs, avgTokens = 16)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_tok")).as("covered"), count(lit(1)).as("n_chunks"),
        sum(when(col("fp").isNull, 1).otherwise(0)).as("null_fps"))
    val expected = docs
      .select(col("doc_id"), size(Portable.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
    val joined = perDoc.join(expected, "doc_id")
      .select(col("doc_id"), col("covered"), col("n_tok"), col("null_fps"))
      .as[(Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, covered, n, nulls) =>
      assert(covered == n, s"doc $id covers $covered of $n tokens")
      assert(nulls == 0L, s"doc $id has null fingerprints")
    }
  }

  test("shift resistance: a prepended token leaves later chunks identical") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    // pick a prefix token that is not itself a chunk boundary
    val prefix = (1 to 50).map(i => s"pre$i")
      .find(t => graft.functions.Portable60.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)) % 16 != 0).get
    val docs = Seq((1L, base), (2L, s"$prefix $base")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, avgTokens = 16)
      .orderBy(col("doc_id"), col("fp"))
      .as[(Long, Long, Long)].collect()
    val a = chunks.filter(_._1 == 1L).map(c => (c._2, c._3)).sorted.toSeq
    val b = chunks.filter(_._1 == 2L).map(c => (c._2, c._3)).sorted.toSeq
    assert(a.size > 3, s"fixture too short to chunk (got ${a.size} chunks)")
    // every chunk except each doc's first (the one containing the edit)
    // must appear in both
    val shared = a.intersect(b)
    assert(shared.size >= a.size - 1, s"only ${shared.size} of ${a.size} chunks survive a prefix edit")
  }

  test("q107 plan: no exchange below the fingerprint aggregate, top-k is TakeOrdered") {
    val plan = SparkEntry.queries("q107_cdc_chunk_dedup")(spark, sf)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val topK = plan.collect {
      case tk: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => tk
    }
    assert(topK.nonEmpty, s"no TakeOrderedAndProject:\n${plan.toString.take(600)}")
    // exchanges: one for the fp groupBy, one inside the distinct-doc_id
    // expand — but nothing below the chunk projection (the split itself
    // must stay scan-side)
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, "chunking must read the corpus exactly once")
  }
}
