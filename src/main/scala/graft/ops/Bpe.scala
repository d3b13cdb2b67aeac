package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the "train
  * the tokenizer on the corpus" step of a training-data pipeline,
  * following the classic word-frequency formulation (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — public algorithm).
  *
  * Scale shape, and why this works at 100 TB: the corpus is touched by
  * exactly ONE corpus-scale pass — the word-frequency aggregate (a
  * map-side-combining groupBy on words). Everything after runs on the
  * VOCABULARY frame (distinct words × frequency), which is
  * tens-of-millions of rows for any real corpus regardless of corpus
  * bytes. Each merge iteration is then: one pair-count aggregate over
  * vocab-sized data (shuffle keyed on symbol pairs, heavily combined
  * map-side), one driver-side argmax of a SINGLE row (the chosen merge
  * is a scalar decision — the one justified collect), and one scan-side
  * typed map applying the merge. Lineage is flattened with
  * localCheckpoint every few rounds, the same discipline as the
  * connected-components loop.
  *
  * Merge application is greedy left-to-right, non-overlapping (the
  * reference implementation's convention: "aaaa" under merge (a,a)
  * becomes [aa, aa], not three overlapping pairs). Ties in pair counts
  * break lexicographically on (a, b) so training is deterministic
  * across partitionings and engines.
  */
object Bpe {

  final case class SymWord(word: String, freq: Long, syms: Seq[String])
  final case class Merge(a: String, b: String, cnt: Long)

  /** End-of-word marker, as in the reference algorithm: it keeps
    * word-final subwords distinct from word-internal ones. */
  val EndMark = "</w>"

  /** The vocabulary frame: (word, freq, syms) where syms = the word's
    * characters plus [[EndMark]]. The ONLY corpus-scale pass. */
  def wordCorpus(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Portable.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat(split(col("word"), ""), array(lit(EndMark))))

  /** Corpus-weighted adjacent-pair counts over the symbolized vocab:
    * (a, b, cnt). Pair extraction is a scan-side HOF (no per-row UDF);
    * the aggregate combines map-side before the pair-keyed exchange. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1)," +
          " (s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** The next merge: highest corpus count, ties lexicographic on (a, b).
    * None when no pair occurs at least `minCount` times. */
  def topPair(words: DataFrame, minCount: Long = 2L): Option[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    pairCounts(words)
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1).as[Merge].collect().headOption
  }

  /** Greedy left-to-right, non-overlapping application of merge (a, b)
    * to one symbol sequence. */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The merge applied across the vocabulary frame — a scan-side typed
    * map (per-row imperative logic is exactly what the typed Dataset
    * escape hatch is for; no shuffle, no collect). */
  def applyMergeDF(words: DataFrame, a: String, b: String): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("word"), col("freq"), col("syms")).as[SymWord]
      .map(w => w.copy(syms = applyMerge(w.syms, a, b)))
      .toDF("word", "freq", "syms")
  }

  /** Train `numMerges` BPE merges over the corpus. Returns the merge
    * list (in application order, with corpus counts at selection time)
    * and the final symbolized vocabulary. Stops early when no pair
    * reaches `minCount`. */
  def train(docs: DataFrame, numMerges: Int, minCount: Long = 2L,
      textCol: String = "text", checkpointEvery: Int = 10): (Seq[Merge], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = wordCorpus(docs, textCol)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      topPair(words, minCount) match {
        case Some(m) =>
          merges += m
          words = applyMergeDF(words, m.a, m.b)
          // flatten lineage: without this, iteration i's plan nests all
          // i-1 prior maps and the driver's analysis time grows
          // superlinearly (the CC-loop discipline)
          if ((i + 1) % checkpointEvery == 0)
            words = words.localCheckpoint(eager = true)
        case None => done = true
      }
      i += 1
    }
    (merges.toSeq, words)
  }

  /** Tokenize a text column with a trained merge list: per word, replay
    * the merges in order (scan-side typed map, merges broadcast via the
    * closure — a merge table is KBs). The training-time and
    * inference-time segmentations agree by construction because both
    * apply the same greedy rule in the same order. */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val local = merges.toIndexedSeq
    docs.select(col(textCol).as("text")).as[String].map { text =>
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      val toks = words.flatMap { w =>
        var syms: Seq[String] = w.split("").toSeq :+ EndMark
        local.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
        syms
      }
      (text, toks)
    }.toDF("text", "bpe_tokens")
  }
}
