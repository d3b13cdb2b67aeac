package graft.ops

import java.util.zip.Deflater

import org.apache.spark.ml.feature.{NGram, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** The generalized M1-family text chain (SURVEY §7.4 "text analysis:
  * M1-M5 generalized — all built-in ml.feature"): regex tokenize →
  * stopword removal → word n-grams. All three are stateless transformers
  * (pure projections — no fit pass, no shuffle). */
object TextPipeline {

  /** The quality-scoring stopword vocabulary — the single definition
    * behind q31's stop-ratio rule and the corpus-assembly gate (q65),
    * so the two can't drift apart. */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "or", "and", "of", "to", "in", "on", "is", "it")

  /** tokens → filtered tokens → n-grams, as added columns
    * (`toks`, `toks_clean`, `ngrams`). */
  def tokensAndNGrams(docs: DataFrame, textCol: String = "text", n: Int = 3,
      stopWords: Array[String] = StopWordsRemover.loadDefaultStopWords("english")): DataFrame = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("toks")
      .setPattern("\\s+").setToLowercase(true)
    val stop = new StopWordsRemover()
      .setInputCol("toks").setOutputCol("toks_clean")
      .setStopWords(stopWords)
    val ngram = new NGram().setN(n).setInputCol("toks").setOutputCol("ngrams")
    ngram.transform(stop.transform(tok.transform(docs)))
  }

  /** BM25 relevance of every document against a bag of query terms —
    * the classic retrieval scorer, expressed as one inverted-index pass:
    * explode to (doc, term), filter to the query terms BEFORE any
    * aggregation (the filter rides down to the scan side of the
    * shuffle), then per-(doc, term) tf joined to per-term df. The df and
    * corpus-stats frames are tiny (|query terms| and 1 row) and
    * broadcast. No per-doc vector is ever materialized.
    *
    * idf = ln(1 + (N - df + .5)/(df + .5)) (the Robertson-Sparck Jones
    * form with the +1 floor, non-negative for df near N).
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val toks = docs.select(col(idCol).as("id"),
      graft.ops.Portable.tokens(col(textCol)).as("w"))
    val stats = toks.select(size(col("w")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    // doc length rides through the explode so no separate lens scan/join
    // is needed; tf is cached because df is derived from it (without the
    // cache Spark re-scans the corpus for the df branch). Bounded:
    // ≤ |docs containing a query term| × |query terms| rows. The cache
    // lives until the session drops it (the harness clears caches after
    // every query); long-lived callers scoring many query bags should
    // spark.catalog.clearCache() between calls.
    val tf = toks
      .select(col("id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .cache()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .groupBy(col("id"))
      .agg(round(sum(col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))), 6)
        .as("bm25"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval score (Zhai &
    * Lafferty 2001) — the language-model ranker next to [[bm25]]:
    * score(q, d) = Σ_{t∈q} ln((tf_{t,d} + μ·cf_t/T) / (dl_d + μ)).
    * Unlike BM25, a query term a DOC lacks still contributes (the
    * smoothed collection probability cf_t/T), so every document is
    * scored — callers take a top-k, never the full ranking. Terms
    * absent from the WHOLE corpus (cf=0) are dropped before scoring:
    * their contribution would be ln(0) = -Infinity for every doc,
    * collapsing all scores to -Infinity and degenerating the top-k to
    * an id sort (and engines disagree on ln(0)). Determinism contract: tf,
    * cf, dl, T are exact longs; each term's contribution is one fixed
    * double expression, and the per-doc sum folds in ascending TERM
    * order (sort_array + aggregate — BM25's plain sum is only safe
    * because its per-doc term sets are tiny; here the fold makes the
    * order explicit). Returns (id, dl, ql) with `ql` the RAW double —
    * rank on it, round only for reporting.
    *
    * Scale: lens is one scan; the tf frame is the query-term-filtered
    * inverted index (postings-bounded); the per-doc grid is
    * |docs|·|queryTerms| rows with the |queryTerms|-row stats frame
    * broadcast.
    *
    * Edge case (r20 ADVICE, documented contract): terms with corpus
    * frequency 0 contribute nothing and are dropped from the grid; if
    * EVERY query term is corpus-absent the stats frame is empty, the
    * grid is empty, and the function returns 0 rows — "every document
    * is scored" holds for queries with at least one in-corpus term. */
  def queryLikelihood(docs: DataFrame, queryTerms: Seq[String],
      mu: Double = 1000.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val toks = docs.select(col(idCol).as("id"),
      graft.ops.Portable.tokens(col(textCol)).as("w"))
    val lens = toks.select(col("id"), size(col("w")).cast("long").as("dl"))
      .localCheckpoint(true) // feeds T, the grid and the output
    val bigT = lens.agg(sum(col("dl")).as("t"))
    val tf = toks
      .select(col("id"), explode(col("w")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // postings-bounded; also folds into cf
    // collection frequency is Σ_d tf — derived from the tf frame, no
    // second tokenize pass. Terms absent from the WHOLE corpus are
    // DROPPED (cf frame only contains present terms): a cf=0 term
    // would contribute ln(0/(dl+mu)) = -Infinity to EVERY document,
    // collapsing all scores and degenerating the top-k to an id sort
    // — and engines disagree on ln(0). Present terms still contribute
    // the smoothed collection probability for docs where tf=0.
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val stats = cf.crossJoin(bigT)
    lens.crossJoin(broadcast(stats))
      .join(tf, Seq("id", "term"), "left")
      .select(col("id"), col("dl"), col("term"),
        log((coalesce(col("tf"), lit(0L)).cast("double") +
          lit(mu) * col("cf").cast("double") / col("t").cast("double")) /
          (col("dl").cast("double") + lit(mu))).as("contrib"))
      .groupBy(col("id"), col("dl"))
      .agg(sort_array(collect_list(struct(col("term"), col("contrib"))))
        .as("cs"))
      .select(col("id"), col("dl"),
        expr("aggregate(cs, cast(0.0 as double), " +
          "(acc, e) -> acc + e.contrib)").as("ql"))
  }

  /** Context-window chunking: split each document's token stream into
    * fixed-size chunks with overlap (`stride` < `chunkSize` overlaps by
    * the difference) — the standard pre-tokenization step of LLM corpus
    * prep. Entirely map-side (array ops + one explode, no shuffle);
    * emits a portable fingerprint per chunk rather than the chunk text
    * so downstream dedup/verify work on fixed-width keys.
    */
  def chunk(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    graft.functions.GraftFunctions.register(docs.sparkSession) // p60
    docs
      .select(col(idCol).as("doc_id"), graft.ops.Portable.tokens(col(textCol)).as("w"))
      .withColumn("n_chunks",
        (ceil(greatest(lit(0), size(col("w")) - chunkSize) / lit(stride.toDouble)))
          .cast("int") + 1)
      .select(col("doc_id"), col("w"),
        posexplode(expr(s"transform(sequence(0, n_chunks - 1), i -> slice(w, i * $stride + 1, $chunkSize))"))
          .as(Seq("chunk_id", "toks")))
      .select(col("doc_id"), col("chunk_id"),
        size(col("toks")).as("n_tokens"),
        Portable.p60(concat_ws(" ", col("toks"))).as("chunk_fp"))
  }

  /** T5/UL2-style SPAN CORRUPTION pair generation — the denoising-
    * objective data op: replace token spans with numbered sentinels in
    * the input and emit the masked content (sentinel-prefixed) as the
    * target. The standard formulation samples span starts sequentially
    * ("skip if already inside a span"), which is order-dependent and
    * neither parallel nor engine-replayable; here the token stream is
    * cut into fixed BLOCKS of `block` tokens and a deterministic hash
    * of (doc_id, block) decides whether that block's first `span`
    * tokens are masked. Blocks are independent → the whole generator
    * is one scan-side projection (no shuffle, no state), restartable
    * and bit-identical on any engine/partitioning — the negative-
    * sampling/epoch-shuffle determinism argument applied to masking.
    * Defaults block=10, span=3, rateBp=5000 give the T5 paper's ~15%
    * token corruption rate with mean span 3.
    *
    * Output per doc: n_tokens, n_spans, n_masked (a short final block
    * masks min(span, remaining)), input_text (`<extra_id_k>` sentinels
    * in reading order), target_text (sentinel + masked tokens). */
  def spanCorrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", block: Int = 10, span: Int = 3,
      rateBp: Int = 5000): DataFrame = {
    import org.apache.spark.sql.functions._
    require(block > 0 && span > 0 && span < block,
      s"need 0 < span < block, got span=$span block=$block")
    require(rateBp >= 0 && rateBp <= 10000, s"rateBp out of range: $rateBp")
    graft.functions.GraftFunctions.register(docs.sparkSession) // p60
    docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("nb", expr(s"(size(toks) + ${block - 1}) DIV $block").cast("int"))
      // masked block ids, in order — the only hash decision
      .withColumn("mb", expr(
        s"""filter(sequence(0, nb - 1), b ->
           |  p60(concat(CAST(doc_id AS STRING), ':', CAST(b AS STRING)))
           |    % 10000 < $rateBp)""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("mb")).as("n_spans"),
        expr(s"""CAST(aggregate(mb, 0L,
          |(a, b) -> a + least($span, size(toks) - b * $block)) AS BIGINT)"""
          .stripMargin).as("n_masked"),
        expr(
          s"""array_join(flatten(transform(sequence(0, nb - 1), b ->
             |  CASE WHEN array_contains(mb, b)
             |       THEN concat(
             |         array(concat('<extra_id_',
             |                      CAST(size(filter(mb, x -> x < b)) AS STRING),
             |                      '>')),
             |         slice(toks, b * $block + $span + 1, ${block - span}))
             |       ELSE slice(toks, b * $block + 1, $block) END)), ' ')"""
            .stripMargin).as("input_text"),
        expr(
          s"""array_join(flatten(transform(mb, b ->
             |  concat(
             |    array(concat('<extra_id_',
             |                 CAST(size(filter(mb, x -> x < b)) AS STRING),
             |                 '>')),
             |    slice(toks, b * $block + 1, $span)))), ' ')""".stripMargin)
          .as("target_text"))
  }

  /** GPT-style sequence packing: concatenate every document's tokens in
    * doc-id order into one global stream and cut it every `seqLen`
    * tokens — the standard way training examples are actually formed
    * (docs are packed back-to-back; a doc may straddle a sequence
    * boundary). Emits one row per (doc, sequence) span:
    * (doc_id, seq_id, pos, n_tok) where `pos` is the span's offset
    * INSIDE its sequence — exactly what a loader needs to materialize
    * sequence `seq_id` without touching any global state.
    *
    * The global token offset is a prefix sum, computed WITHOUT a global
    * single-task window: docs are bucketed by id range (`bucketWidth`
    * ids per bucket — id-space, so order-preserving by construction),
    * the within-bucket running sum is a partitioned window (parallel,
    * codegen), and only the per-bucket totals — maxId/bucketWidth rows,
    * thousands at 100 TB — pass through the one unpartitioned window
    * before broadcasting back. A single global `ORDER BY doc_id ROWS
    * UNBOUNDED PRECEDING` window would funnel the whole corpus through
    * one task; this is the two-level scan-scan-broadcast form that
    * doesn't.
    *
    * Zero-token docs contribute nothing to the stream and emit no span.
    * All arithmetic is exact integer math (both engines), so results
    * hash-match the oracle. Requires non-negative doc ids (DIV
    * bucketing). */
  def pack(docs: DataFrame, seqLen: Int, bucketWidth: Long = 1L << 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, s"sequence length must be positive, got $seqLen")
    require(bucketWidth > 0, s"bucket width must be positive, got $bucketWidth")
    val counted = docs.select(col(idCol).cast("long").as("doc_id"),
        size(Portable.tokens(col(textCol))).cast("long").as("n"))
      .withColumn("b", expr(s"doc_id DIV $bucketWidth"))
    val localWin = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = counted.withColumn("loff", coalesce(sum(col("n")).over(localWin), lit(0L)))
    // per-bucket totals: tiny frame; the unpartitioned window runs over
    // #buckets rows, not #docs
    val bucketWin = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counted.groupBy(col("b")).agg(sum(col("n")).as("bn"))
      .withColumn("boff", coalesce(sum(col("bn")).over(bucketWin), lit(0L)))
      .select(col("b"), col("boff"))
    local.join(broadcast(offsets), "b")
      .withColumn("off", col("boff") + col("loff"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), col("off"),
        explode(expr(s"sequence(off DIV $seqLen, (off + n - 1) DIV $seqLen)")).as("seq_id"))
      .select(col("doc_id"), col("seq_id"),
        (greatest(col("off"), col("seq_id") * seqLen) - col("seq_id") * seqLen).as("pos"),
        (least(col("off") + col("n"), (col("seq_id") + 1) * seqLen)
          - greatest(col("off"), col("seq_id") * seqLen)).as("n_tok"))
  }

  /** Length-bucketed batching telemetry: group documents into token-
    * length buckets of `widthTokens` and report, per bucket, the doc and
    * token counts, the bucket's max length, and the padding waste if
    * batches were formed within the bucket and padded to its max —
    * the measurement that justifies length-bucketed batching for
    * training/inference (vs padding everything to the global max, whose
    * waste the caller gets by comparing against a width covering all
    * lengths). One scan-side projection + one partial-aggregating
    * groupBy on the bounded bucket key — no window, no N². The waste
    * share is exact-integer parts-per-million (floor division), not a
    * rounded double: round-to-6dp of a dyadic rational whose 7th digit
    * is an exact 5 (denominator a power of two — e.g. 4 docs padded to
    * 32 gives /128) splits between Spark's HALF_UP and DuckDB's
    * HALF_EVEN, while integer DIV is identical everywhere. */
  def lengthBuckets(docs: DataFrame, widthTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(widthTokens > 0, s"bucket width must be positive, got $widthTokens")
    docs.select(size(Portable.tokens(col(textCol))).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("bucket", expr(s"(n - 1) DIV $widthTokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        max(col("n")).as("max_len"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"), col("max_len"),
        (col("n_docs") * col("max_len") - col("n_tokens")).as("pad_tokens"),
        expr("(n_docs * max_len - n_tokens) * 1000000 DIV (n_docs * max_len)")
          .as("pad_ppm"))
  }

  /** Boilerplate share per document: tile each doc into non-overlapping
    * `blockTokens`-token blocks ([[chunk]] with stride = size), count the
    * blocks whose fingerprint recurs in >= `minDf` distinct documents
    * (headers, footers, templates — the classic LLM-corpus noise), and
    * report the per-doc boilerplate ratio. The repeated-fingerprint
    * frame is small (only recurring blocks) and broadcasts. The chunk
    * stream is computed twice (df pass + scoring pass) — it's pure
    * map-side work off the scan, cheaper than persisting a corpus-sized
    * intermediate. */
  def boilerplate(docs: DataFrame, blockTokens: Int = 16, minDf: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val chunks = chunk(docs, chunkSize = blockTokens, stride = blockTokens,
      idCol = idCol, textCol = textCol)
    val rep = chunks.groupBy(col("chunk_fp"))
      .agg(countDistinct(col("doc_id")).as("block_df"))
      .filter(col("block_df") >= minDf)
      .select(col("chunk_fp"), lit(1).as("is_rep"))
    chunks.join(broadcast(rep), Seq("chunk_fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        coalesce(sum(col("is_rep")), lit(0L)).cast("long").as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast("double") / col("n_blocks"), 6))
  }

  /** Unigram language-model quality score — the KenLM-perplexity
    * stand-in of LLM corpus filtering: train the LM as corpus-wide term
    * frequencies (one aggregate), score each document by its mean token
    * negative log-probability (-avg ln(tf_t / T)). High scores = rare-
    * token-heavy documents (gibberish, OCR noise); low = templated.
    * The LM join shuffles on the term key (partial-aggregated tf, no
    * broadcast assumption — at 100 TB the vocabulary doesn't fit). The
    * token stream is scanned once for the LM and once for scoring; a
    * production pipeline materializes the LM frame and amortizes it
    * across every scoring run, which is the `lm` sub-frame here. */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val toks = docs.select(col(idCol).as("id"),
      explode(graft.ops.Portable.tokens(col(textCol))).as("term"))
    val lm = toks.groupBy(col("term")).agg(count(lit(1)).cast("double").as("tf"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).cast("double").as("total"))))
      .select(col("term"), log(col("tf") / col("total")).as("logp"))
    toks.join(lm, "term")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(col("logp")), 6).as("avg_neg_logprob"))
  }

  /** Bigram add-one LM quality score — the next rung above
    * [[unigramLogProb]] toward the CCNet-style perplexity filter: train
    * bigram counts on the corpus, score every document by mean
    * conditional negative log-probability with Laplace smoothing,
    * p(w2|w1) = (c(w1,w2) + 1) / (c_hist(w1) + V). The history count
    * c_hist(w1) = Σ_w2 c(w1,w2) makes the smoothed conditional a true
    * distribution; V is the corpus-wide distinct-token count (the
    * smoothing vocabulary). Degenerate generation loops score
    * suspiciously LOW (their bigrams dominate the corpus), incoherent
    * token salad scores high — both tails are curation signals.
    *
    * Scale shape: bigram extraction is a scan-side HOF; the count
    * frames are distinct-bigram- and vocab-sized (map-side combined);
    * scoring joins key on grams — the inverted-index orientation, no
    * per-doc LM vector ever materialized. The bigram frame is cached
    * because counts and scoring both read it (the BM25 precedent), and
    * UNPERSISTED before returning: the doc-sized score frame is
    * eagerly materialized (localCheckpoint — it is orders of magnitude
    * smaller than the bigram stream), so the cache's lifetime is
    * scoped to this call instead of accreting executor storage across
    * a long-lived session until a global clearCache. */
  def bigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val bi = docs
      .select(col(idCol).as("id"), Portable.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("id"), explode(expr(
        "transform(slice(w, 1, size(w) - 1)," +
          " (s, i) -> struct(s AS w1, element_at(w, i + 2) AS w2))")).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .cache()
    try {
      val cb = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val cu = bi.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
      val vocab = docs.select(explode(Portable.tokens(col(textCol))).as("term"))
        .filter(col("term") =!= "")
        .agg(countDistinct(col("term")).as("v"))
      bi.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(-avg(log((col("cb") + lit(1.0)) / (col("cu") + col("v")))), 6)
            .as("avg_neg_logprob"))
        .localCheckpoint(eager = true)
    } finally bi.unpersist(blocking = false): Unit
  }

  /** Cross-document duplicated-span ratio — the exact-substring-dedup
    * signal of LLM corpus prep (the "how much of this document appears
    * verbatim elsewhere" measure; documents above a threshold get their
    * duplicate spans cut or are dropped whole): per document, the
    * fraction of its n-token window positions whose window also occurs
    * in at least one OTHER document.
    *
    * Scale shape: one per-position window stream off the scan, df over
    * the DISTINCT (doc, window) pairs (partial-aggregated — a hot window
    * collapses map-side), and a shuffle join back on the window key. No
    * broadcast assumption: at corpus scale the repeated-window frame is
    * itself large; skew on hot windows is AQE's skew-join case. Spans,
    * not shingle sets: positions count multiplicity, so a doc that is
    * 90% one repeated template line scores 0.9, not one shingle's worth.
    * The window stream is computed twice (df pass + join-back pass) by
    * the same trade [[boilerplate]] documents: it is pure map-side work
    * off the scan, and persisting a corpus-sized exploded intermediate
    * is the costlier choice at the design scale.
    */
  def dupSpanRatio(docs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val gram = (0 until n).map(j => s"w[i+$j]").mkString(", ")
    val wins = docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $gram))"))
          .as("s"))
    val rep = wins.select(col("doc_id"), col("s")).distinct()
      .groupBy(col("s")).agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2)
      .select(col("s"), lit(1).as("is_dup"))
    wins.join(rep, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        coalesce(sum(col("is_dup")), lit(0)).cast("long").as("n_dup_spans"))
      .withColumn("dup_ratio",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
  }

  /** Benchmark decontamination — the n-gram-overlap check every serious
    * training corpus runs against its eval sets: a train document is
    * contaminated if it shares at least one n-token gram with any
    * benchmark document. Emits every train doc with its shared-gram
    * count (distinct grams) and the flag, so the caller can threshold or
    * hard-drop.
    *
    * Scale shape: the benchmark side is small by construction (eval sets
    * are MBs against a 100 TB corpus), so its distinct gram set is
    * broadcast and the train side never shuffles — the whole check is
    * scan + map-side join + per-doc aggregate. */
  def decontaminate(train: DataFrame, benchmark: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(train.sparkSession)
    // word_shingles: codegen one-pass distinct n-grams (see
    // Dedup.shingles) — per-doc distinct before the explode also cuts
    // the exploded volume both downstream distincts were paying for
    def grams(docs: DataFrame): DataFrame = docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(s"word_shingles(w, $n)")).as("s"))
    val benchGrams = grams(benchmark).select(col("s")).distinct()
      .select(col("s"), lit(1).as("hit"))
    // no .distinct() on the train side: word_shingles already emits
    // per-doc DISTINCT grams (LinkedHashSet), so (doc_id, s) rows are
    // distinct by construction — the former distinct was a redundant
    // full exchange of the exploded frame (caught by the r18 100x
    // rehearsal: the train gram frame is the corpus-sized side)
    val shared = grams(train)
      .join(broadcast(benchGrams), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(col("hit")), lit(0)).cast("long").as("n_shared_grams"))
    train.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** Intra-document repetition metrics (the Gopher-family repetition
    * filters): per document, the share of n-gram positions whose gram
    * recurs within the same document (`dup_ratio`) and the share taken
    * by the single most frequent gram (`top_ratio`). High values mark
    * degenerate generation loops, scraped boilerplate and list spam.
    * Both shuffles key on (doc, gram) then doc — skew is bounded by
    * document length, never corpus-wide. */
  def repetition(docs: DataFrame, n: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val gram = (0 until n).map(j => s"w[i+$j]").mkString(", ")
    docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $gram))"))
          .as("s"))
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_ratio"),
        round(sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("double") /
          sum(col("c")), 6).as("dup_ratio"))
  }

  /** Pattern redaction (PII scrubbing): the replaced text plus the
    * number of hits, as a pair of columns. Patterns must stay within the
    * regex dialect common to Java and RE2 for oracle parity. */
  def redact(text: Column, pattern: String, replacement: String): (Column, Column) = {
    import org.apache.spark.sql.functions._
    (regexp_replace(text, pattern, replacement),
      size(regexp_extract_all(text, lit(pattern), lit(0))))
  }

  /** Deflate compression ratio of the text (compressed/raw bytes) — a
    * standard LLM-data quality signal: highly repetitive or templated
    * documents compress far below prose (ratio << 1) and get filtered
    * before training. Deterministic (fixed level, no dictionary), but
    * zlib output is not SQL-expressible -> rows-only at the driver,
    * behavior pinned in OpsSpec. */
  val compressionRatio: Column => Column = {
    val f = udf { (text: String) =>
      if (text == null || text.isEmpty) 1.0
      else {
        val raw = text.getBytes("UTF-8")
        val d = new Deflater(Deflater.BEST_SPEED, false)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        var n = 0
        while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
        d.end()
        math.round(n.toDouble / raw.length * 1e6) / 1e6
      }
    }
    c => f(c)
  }

  /** Corpus-level span scrubbing (the paragraph-dedup curation step of
    * public LLM-data pipelines: drop PASSAGES that recur across
    * documents — navigation boilerplate, license blocks, templated
    * intros — and keep the rest of each document, rather than dropping
    * whole documents the way doc-level dedup does). Documents are cut
    * into fixed non-overlapping `window`-token spans; spans occurring in
    * >= `minDocs` DISTINCT documents are removed; survivors reassemble
    * in order into `clean_text`, with kept/dropped span counts so the
    * removal volume is monitored, not silent.
    *
    * Scale shape: one scan-side windowing (HOF, no per-row UDF), one
    * doc-frequency aggregate keyed on the span (map-side combined; the
    * hot boilerplate span IS the frequent key, and it arrives
    * pre-combined per map task), one join back, and one per-document
    * reassembly aggregate whose state is the document's own spans —
    * bounded by document length, never corpus-wide. The span key could
    * be fingerprinted (p60) to cut exchange bytes at 100 TB; the raw
    * span key keeps the op collision-free and the plan identical. */
  def scrubSharedSpans(docs: DataFrame, windowTokens: Int = 10, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(windowTokens > 0 && minDocs > 1, s"windowTokens=$windowTokens minDocs=$minDocs")
    val spans = docs
      .select(col(idCol).as("doc_id"), Portable.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(w) - 1) div $windowTokens)," +
          s" i -> array_join(slice(w, i * $windowTokens + 1, $windowTokens), ' '))")))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "span")
    val shared = spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("span"))
    val kept = spans.join(shared, Seq("span"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(idx, span)))," +
          " e -> e.span), ' ')").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = spans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS algorithm): the DISTINCT set of
    * window-minimum k-gram hashes per document. Winnowing's guarantee
    * — every shared substring of length >= k + w − 1 contributes at
    * least one shared fingerprint — is what q33's single global-min
    * fingerprint cannot give: it localizes overlap instead of
    * summarizing the whole document, so partial plagiarism/quotation
    * is caught, not just whole-document duplication.
    *
    * Everything is computed INSIDE one row — the codegen'd
    * [[graft.functions.Winnow60]] expression (one O(len) hash pass +
    * a monotonic-deque sliding minimum; rationale on
    * TextHashOps.winnow60, including why the composed-HOF spelling is
    * accidentally QUADRATIC after CollapseProject). Output (doc_id,
    * fp) exploded at the edge — the document's density-reduced
    * sketch, |fps| ≈ 2·len/(w+1). Hashes are the cross-engine p60, so
    * the DuckDB oracle replays the exact fingerprint sets. */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    require(k > 0 && w > 0, s"k=$k w=$w must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"),
        Portable.normText(col(textCol)).as("nt"))
      .select(col("doc_id"),
        explode(expr(s"winnow60(nt, $k, $w)")).as("fp"))
  }

  /** Winnowing near-dup pairs: documents sharing fingerprints from
    * [[winnowFingerprints]], scored by COVERAGE = shared /
    * min(|fps_a|, |fps_b|) (the MOSS report metric — containment on
    * the fingerprint sketch, so a short document quoted inside a long
    * one still scores ~1.0 where Jaccard would dilute it).
    *
    * Scale shape: the pair generation is the LSH-style bucket
    * equi-join on the fingerprint VALUE — pair volume is
    * Σ_fp df(fp)², governed by fingerprint document-frequency, not
    * corpus size — with the q59/q36 df-cap applied first (a
    * fingerprint appearing in more than `maxDf` docs is boilerplate,
    * carries no pair-discriminative signal, and is exactly the hot key
    * that would quadratic the join; price the recall with the usual
    * telemetry if it ever binds). The threshold decision is the exact
    * integer cross-multiplication `shared · den >= num · minFps` —
    * rounding never decides membership (the q161 convention); the
    * reported coverage is 6dp-rounded at the edge. */
  def winnowPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, w: Int = 8,
      minCoverageNum: Int = 1, minCoverageDen: Int = 2,
      maxDf: Int = 200): DataFrame = {
    import org.apache.spark.sql.functions._
    require(minCoverageNum > 0 && minCoverageDen > 0 && maxDf >= 2,
      s"minCoverage=$minCoverageNum/$minCoverageDen maxDf=$maxDf")
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
      .localCheckpoint(true) // feeds sizes, df-cap and both join sides
    val sizes = fps.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nf"))
    val kept = fps.join(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs") <= maxDf).select(col("fp")),
      Seq("fp"), "left_semi")
    val a = kept.select(col("doc_id").as("doc_a"), col("fp"))
    val b = kept.select(col("doc_id").as("doc_b"), col("fp"))
    a.join(b, "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nf").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nf").as("nb")), "doc_b")
      .filter(col("shared_fps") * minCoverageDen >=
        least(col("na"), col("nb")) * minCoverageNum)
      .select(col("doc_a"), col("doc_b"), col("shared_fps"),
        round(col("shared_fps").cast("double") /
          least(col("na"), col("nb")).cast("double"), 6).as("coverage"))
  }

  /** What [[winnowPairs]]' df purge costs (the q101/q184/q277/q278
    * telemetry convention): one row of fingerprint-type / posting /
    * pair-volume counts split at `maxDf`, from the fingerprint
    * document-frequency histogram alone — |fingerprints| input rows,
    * integer arithmetic, no pair materialization. `n_pairs_kept` is
    * the Σ df·(df−1)/2 the bucket join will actually pay;
    * `n_pairs_purged` is what the cap saved — the number to watch as
    * the corpus grows, since candidate volume at a fixed cap is what
    * decides whether the operating point still holds (the q36
    * corpus-proportional-candidates lesson). */
  def winnowDfTelemetry(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 16, w: Int = 8,
      maxDf: Int = 200): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = winnowFingerprints(docs, idCol, textCol, k, w)
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val pairs = expr("df * (df - 1) DIV 2")
    df.agg(
      count(lit(1)).as("n_fps"),
      sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("n_fps_purged"),
      max(col("df")).as("max_df"),
      coalesce(max(when(col("df") <= maxDf, col("df"))), lit(0L))
        .as("max_df_kept"),
      sum(when(col("df") <= maxDf, col("df")).otherwise(0L))
        .as("n_postings_kept"),
      sum(when(col("df") > maxDf, col("df")).otherwise(0L))
        .as("n_postings_purged"),
      sum(when(col("df") <= maxDf, pairs).otherwise(0L)).as("n_pairs_kept"),
      sum(when(col("df") > maxDf, pairs).otherwise(0L)).as("n_pairs_purged"))
  }
}
