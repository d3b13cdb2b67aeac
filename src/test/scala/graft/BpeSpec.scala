package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE training on the classic reference corpus (the low/lower/newest/
  * widest example from the public algorithm description): the merge
  * sequence is hand-computable, ties break lexicographically, merge
  * application is greedy non-overlapping, and segmentation replays
  * training exactly. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // 5x low, 2x lower, 6x newest, 3x widest — one word per doc is fine,
  // wordCorpus counts across the whole frame
  private def classicDocs = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).toDF("text")

  test("classic corpus: first merges are (e,s), (es,t), (est,</w>) at count 9") {
    // hand count: (e,s) = 6 (newest) + 3 (widest) = 9, tied with (s,t)
    // and (t,</w>) — lexicographic tie order picks (e,s); after merging,
    // (es,t) = 9 ties (t,</w>) -> (es,t); then (est,</w>) = 9 unique
    val (merges, words) = Bpe.train(classicDocs, numMerges = 3)
    assert(merges.map(m => (m.a, m.b, m.cnt)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)))
    // reconstruction invariant: merging only concatenates adjacent
    // symbols, so the joined symbols are always word + </w>
    val bad = words.select(col("word"), concat_ws("", col("syms")).as("joined"))
      .filter(col("joined") =!= concat(col("word"), lit(Bpe.EndMark)))
    assert(bad.isEmpty, bad.collect().mkString(", "))
    // "newest" is now n,e,w,est</w>
    val newest = words.filter(col("word") === "newest")
      .select(col("syms")).as[Seq[String]].head()
    assert(newest == Seq("n", "e", "w", "est</w>"))
  }

  test("merge application is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a", "</w>"), "a", "a") ==
      Seq("aa", "aa", "</w>"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "</w>"), "a", "a") ==
      Seq("aa", "a", "</w>"))
    assert(Bpe.applyMerge(Seq("x", "</w>"), "a", "b") == Seq("x", "</w>"))
    // merged symbol can participate in a later merge
    assert(Bpe.applyMerge(Seq("aa", "aa", "</w>"), "aa", "aa") == Seq("aaaa", "</w>"))
  }

  test("segment replays training merges on unseen text") {
    val (merges, _) = Bpe.train(classicDocs, numMerges = 3)
    val seg = Bpe.segment(Seq("newest newest bestest").toDF("text"),
      merges.map(m => (m.a, m.b)))
    val toks = seg.select(col("bpe_tokens")).as[Seq[String]].head()
    // newest -> n,e,w,est</w> twice; bestest (unseen, chars
    // b,e,s,t,e,s,t,</w>) replays (e,s) -> b,es,t,es,t,</w>, then
    // (es,t) -> b,est,est,</w>, then (est,</w>) -> b,est,est</w>
    assert(toks == Seq("n", "e", "w", "est</w>", "n", "e", "w", "est</w>",
      "b", "est", "est</w>"))
  }

  test("training runs correctly across the localCheckpoint boundary") {
    // checkpointEvery=2 with 6 merges crosses the lineage-flattening
    // boundary three times; the merge sequence must be identical to an
    // uncheckpointed run (checkpointing is an execution detail)
    val (a, _) = Bpe.train(classicDocs, numMerges = 6, checkpointEvery = 2)
    val (b, _) = Bpe.train(classicDocs, numMerges = 6, checkpointEvery = 100)
    assert(a == b)
    assert(a.length == 6)
  }

  test("train stops early when no pair reaches minCount") {
    // all words unique singletons: every pair count is 1 < minCount=2
    val docs = Seq("ab", "cd", "ef").toDF("text")
    val (merges, _) = Bpe.train(docs, numMerges = 5)
    assert(merges.isEmpty)
  }
}
