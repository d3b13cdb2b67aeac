package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.ops.{MisraGries, Portable, Sampling, TextPipeline}

/** Training-data-pipeline operators beyond the dedup/similarity families:
  * deterministic sampling/mixing/capping, retrieval scoring (BM25),
  * context-window chunking, boilerplate detection, LM quality scoring,
  * PII redaction, profiling and the composed corpus-assembly funnel.
  * Each uses the 100 TB formulation — hash-gated filters instead of RNG
  * samples, inverted-index scoring instead of per-doc vectors, map-side
  * chunking instead of shuffles, partial-aggregating profiles — and all
  * are oracle-checked value-by-value in DuckDB.
  */
object PipelineQueries {
  import Tables.{apply => t}

  private val p60 = (e: String) => Portable.p60Sql(e)

  /** Per-stratum sampling rates in basis points: keep every purchase
    * (rare, high-value), a quarter of signups, 5% of the click/view
    * firehose, and drop the error stream entirely — one of each regime. */
  private val Rates = Map("purchase" -> 10000, "signup" -> 2500,
    "click" -> 500, "view" -> 500)

  // q31's stopword list (the shared quality-scoring vocabulary)
  private val stopList =
    TextPipeline.QualityStopwords.map(w => s"'$w'").mkString(", ")

  val all: Seq[GraftQuery] = Seq(

    // ---- deterministic stratified sampling (corpus mixing): the gate is
    // a pure filter on a portable hash, so the sample is reproducible
    // across runs/engines/partitionings and evaluates at the scan with
    // zero shuffle. df.sample() can't promise any of that under AQE.
    GraftQuery(
      "q60_stratified_sample",
      (s, d) => Sampling.stratified(t(s, d, "events"),
          key = col("event_id"), stratum = col("event_type"),
          ratesBp = Rates, defaultBp = 0)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .orderBy(col("event_id")),
      Some(s"""SELECT event_id, event_type, user_id FROM events
               WHERE ${p60("CAST(event_id AS VARCHAR)")} % 10000 <
                 CASE event_type WHEN 'purchase' THEN 10000 WHEN 'signup' THEN 2500
                      WHEN 'click' THEN 500 WHEN 'view' THEN 500 ELSE 0 END
               ORDER BY event_id""")),

    // ---- BM25 relevance against a fixed query-term bag: one
    // inverted-index pass, query-term filter applied before any
    // aggregation, df/corpus stats broadcast. Scores rounded (summation
    // order varies between engines).
    GraftQuery(
      "q61_bm25_score",
      (s, d) => TextPipeline.bm25(t(s, d, "documents"),
          queryTerms = Seq("spark", "table", "hash"))
        .select(col("id").as("doc_id"), col("bm25"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              lens AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
              stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM lens),
              tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                     FROM (SELECT doc_id, unnest(w) AS term FROM toks)
                     WHERE term IN ('spark', 'table', 'hash') GROUP BY 1, 2),
              df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
              SELECT doc_id,
                     round(sum(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
              FROM (SELECT t.doc_id, t.tf, ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf, dl, avgdl
                    FROM tf t JOIN df USING (term) CROSS JOIN stats JOIN lens USING (doc_id))
              GROUP BY doc_id ORDER BY doc_id""")),

    // ---- context-window chunking (64-token windows, stride 48): pure
    // map-side array work — no shuffle anywhere in the plan — emitting a
    // portable fingerprint per chunk so chunk-level dedup gets
    // fixed-width keys.
    GraftQuery(
      "q62_doc_chunks",
      (s, d) => TextPipeline.chunk(t(s, d, "documents"), chunkSize = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
               nc AS (SELECT doc_id, w,
                             CAST(ceil(greatest(0, len(w) - 64) / 48.0) AS INTEGER) + 1 AS n_chunks
                      FROM toks),
               ch AS (SELECT doc_id, CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_id, w FROM nc)
               SELECT doc_id, chunk_id,
                      len(w[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS n_tokens,
                      ${p60("array_to_string(w[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')")} AS chunk_fp
               FROM ch ORDER BY doc_id, chunk_id""")),

    // ---- weighted corpus mixing: two sources (documents split by id
    // parity standing in for distinct corpora) hash-sampled to their mix
    // weights and unioned, tagged by origin. Each branch is still a pure
    // scan-side filter; the union is plan-level only (no shuffle until
    // the output sort).
    GraftQuery(
      "q64_corpus_mix",
      (s, d) => {
        val docs = t(s, d, "documents")
        Sampling.mix(Seq(
            ("web", docs.filter(pmod(col("doc_id"), lit(2)) === 0), 8000),
            ("code", docs.filter(pmod(col("doc_id"), lit(2)) === 1), 3000)),
          key = "doc_id")
          .select(col("source"), col("doc_id"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some(s"""SELECT source, doc_id FROM (
                 SELECT 'web' AS source, doc_id FROM documents
                 WHERE doc_id % 2 = 0 AND ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < 8000
                 UNION ALL
                 SELECT 'code', doc_id FROM documents
                 WHERE doc_id % 2 = 1 AND ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < 3000)
               ORDER BY source, doc_id""")),

    // ---- the end-to-end corpus-assembly funnel — quality gate (q31's
    // rule) → exact dedup (min-id survivor per normalized fingerprint)
    // → deterministic 50% hash sample — composed into ONE declarative
    // plan: the filter and the sample gate are scan-side, the dedup is
    // the single shuffle. This is the shape of an actual LLM data-prep
    // job; every stage is the library op, not a re-implementation.
    GraftQuery(
      "q65_corpus_assembly",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), col("text"), Portable.tokens(col("text")).as("w"))
        val quality = toks
          .filter(size(col("w")) >= 10 &&
            expr(s"size(filter(w, t -> t IN ($stopList)))").cast("double")
              / size(col("w")) <= 0.5)
          .select(col("doc_id"), col("text"), size(col("w")).as("n_tokens"))
        val deduped = graft.ops.Dedup.exact(quality)
        Sampling.uniform(deduped, col("doc_id"), 5000)
          .select(col("doc_id"), col("n_tokens"), col("n_copies"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents),
               q AS (SELECT doc_id, text, len(w) AS n_tokens FROM toks
                     WHERE len(w) >= 10
                       AND len(list_filter(w, t -> t IN ($stopList))) * 1.0 / len(w) <= 0.5),
               fp AS (SELECT doc_id, n_tokens, ${p60(Portable.normTextSql("text"))} AS fp FROM q),
               keep AS (SELECT fp, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
                        FROM fp GROUP BY fp)
               SELECT doc_id, n_tokens, n_copies FROM fp JOIN keep USING (fp)
               WHERE doc_id = keep_id AND ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < 5000
               ORDER BY doc_id""")),

    // ---- deterministic per-key cap: at most 3 events per user, chosen
    // by hash order (stable across runs/layouts, unbiased w.r.t. event
    // time or id order — a time-ordered cap would keep only each user's
    // earliest events).
    GraftQuery(
      "q66_cap_per_user",
      (s, d) => Sampling.capPerKey(t(s, d, "events"),
          key = col("user_id"), tieBreak = col("event_id"), k = 3)
        .select(col("user_id"), col("event_id"))
        .orderBy(col("user_id"), col("event_id")),
      Some(s"""SELECT user_id, event_id FROM
                 (SELECT user_id, event_id,
                         row_number() OVER (PARTITION BY user_id
                           ORDER BY ${p60("CAST(event_id AS VARCHAR)")}, event_id) AS rn
                  FROM events)
               WHERE rn <= 3 ORDER BY user_id, event_id""")),

    // ---- boilerplate detection: non-overlapping 16-token blocks whose
    // fingerprint recurs across >= 2 documents (the near-dup corpus has
    // plenty); per-doc boilerplate ratio is the removal signal.
    GraftQuery(
      "q67_boilerplate",
      (s, d) => TextPipeline.boilerplate(t(s, d, "documents"),
          blockTokens = 16, minDf = 2)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
               nc AS (SELECT doc_id, w,
                             CAST(ceil(greatest(0, len(w) - 16) / 16.0) AS INTEGER) + 1 AS n_chunks
                      FROM toks),
               ch AS (SELECT doc_id, CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_id, w FROM nc),
               chunks AS (SELECT doc_id, chunk_id,
                                 ${p60("array_to_string(w[chunk_id * 16 + 1 : chunk_id * 16 + 16], ' ')")} AS fp
                          FROM ch),
               rep AS (SELECT fp, 1 AS is_rep FROM
                         (SELECT fp, count(DISTINCT doc_id) AS block_df FROM chunks GROUP BY fp)
                       WHERE block_df >= 2)
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
                      CAST(coalesce(sum(is_rep), 0) AS BIGINT) AS n_boiler,
                      round(coalesce(sum(is_rep), 0) * 1.0 / count(*), 6) AS boiler_ratio
               FROM chunks LEFT JOIN rep USING (fp)
               GROUP BY doc_id ORDER BY doc_id""")),

    // ---- unigram-LM quality score (the KenLM-perplexity stand-in):
    // corpus term frequencies as the LM, documents scored by mean token
    // negative log-probability.
    GraftQuery(
      "q69_lm_quality",
      (s, d) => TextPipeline.unigramLogProb(t(s, d, "documents"))
        .select(col("id").as("doc_id"), col("n_tokens"), col("avg_neg_logprob"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
              lm AS (SELECT term, ln(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM toks)) AS logp
                     FROM toks GROUP BY term)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     round(-avg(logp), 6) AS avg_neg_logprob
              FROM toks JOIN lm USING (term)
              GROUP BY doc_id ORDER BY doc_id""")),

    // ---- bigram add-one LM quality score (TextPipeline.bigramLogProb —
    // rationale and scale shape there): q69's unigram LM upgraded to
    // conditional bigram probabilities with Laplace smoothing — the
    // CCNet-style perplexity filter one rung up. Counting, smoothing and
    // the history normalization are all integer-exact; only the final
    // ln/avg is floating, rounded 6dp (the q69/q99 convention).
    GraftQuery(
      "q133_bigram_lm",
      (s, d) => TextPipeline.bigramLogProb(t(s, d, "documents"))
        .select(col("id").as("doc_id"), col("n_bigrams"), col("avg_neg_logprob"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              bi AS (SELECT doc_id, pr.a AS w1, pr.b AS w2
                     FROM (SELECT doc_id, unnest([{'a': w[i], 'b': w[i+1]} FOR i IN range(1, len(w))]) AS pr
                           FROM toks WHERE len(w) >= 2)),
              cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
              cu AS (SELECT w1, count(*) AS cu FROM bi GROUP BY 1),
              v AS (SELECT count(DISTINCT term) AS v FROM
                      (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents)
                    WHERE term <> '')
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                     round(-avg(ln((cb + 1.0) / (cu + v))), 6) AS avg_neg_logprob
              FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
              GROUP BY doc_id ORDER BY doc_id""")),

    // ---- CCNet-style perplexity bucketing (Wenzek et al. 2020 — the
    // public head/middle/tail split): q133's bigram-LM score cut at
    // per-LANGUAGE quartile cuts — a 25/50/25 head/middle/tail split at
    // the 0.25/0.75 percentiles (a global cut would just re-discover the
    // language mix — the whole point of per-lang buckets), emitting
    // per-(lang, bucket) doc counts, token mass and mean score. This is
    // the selection stage between LM scoring and sampling: train mostly
    // on head+middle, keep a tail slice for diversity. The cuts are
    // exact interpolated percentiles over the 6dp-rounded scores (both
    // engines bucket identical values — the q129 bounds convention);
    // cut frame is |langs| rows, broadcast back; one extra scan.
    GraftQuery(
      "q146_perplexity_buckets",
      (s, d) => {
        val docs = t(s, d, "documents")
        val scored = TextPipeline.bigramLogProb(docs)
          .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
        val cuts = scored.groupBy(col("lang"))
          .agg(expr("percentile(avg_neg_logprob, array(0.25D, 0.75D))").as("c"))
          .select(col("lang"), col("c")(0).as("c1"), col("c")(1).as("c2"))
        scored.join(broadcast(cuts), "lang")
          .withColumn("bucket",
            when(col("avg_neg_logprob") <= col("c1"), "head")
              .when(col("avg_neg_logprob") <= col("c2"), "middle")
              .otherwise("tail"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bigrams")).as("n_bigrams_total"),
            round(avg(col("avg_neg_logprob")), 6).as("mean_nll"))
          .orderBy(col("lang"), col("bucket"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              bi AS (SELECT doc_id, pr.a AS w1, pr.b AS w2
                     FROM (SELECT doc_id, unnest([{'a': w[i], 'b': w[i+1]} FOR i IN range(1, len(w))]) AS pr
                           FROM toks WHERE len(w) >= 2)),
              cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
              cu AS (SELECT w1, count(*) AS cu FROM bi GROUP BY 1),
              v AS (SELECT count(DISTINCT term) AS v FROM
                      (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents)
                    WHERE term <> ''),
              scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                                round(-avg(ln((cb + 1.0) / (cu + v))), 6) AS nll
                         FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
                         GROUP BY doc_id),
              sl AS (SELECT s.doc_id, s.n_bigrams, s.nll, d.lang
                     FROM scored s JOIN documents d USING (doc_id)),
              cuts AS (SELECT lang, quantile_cont(nll, 0.25) AS c1,
                              quantile_cont(nll, 0.75) AS c2
                       FROM sl GROUP BY 1)
              SELECT lang,
                     CASE WHEN nll <= c1 THEN 'head'
                          WHEN nll <= c2 THEN 'middle'
                          ELSE 'tail' END AS bucket,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams_total,
                     round(avg(nll), 6) AS mean_nll
              FROM sl JOIN cuts USING (lang)
              GROUP BY 1, 2 ORDER BY lang, bucket""")),

    // ---- q146's 100 TB face: the same CCNet head/middle/tail
    // selection with the cuts taken from approx_percentile — a
    // mergeable KLL-style sketch whose per-group state is bounded by
    // the accuracy parameter, where q146's exact `percentile` buffers
    // every distinct 6dp-rounded score per language (a dominant
    // language at 100× is a hundreds-of-MB single aggregation buffer).
    // Sketch cut VALUES aren't oracle-expressible, so this is the
    // q142/q77 band-invariant convention: each approx cut must land
    // inside the exact ±5% RANK band (languages here are 64-218 docs,
    // so the band is a handful of ranks — still ~500× the sketch's
    // 1e-4·N rank-error guarantee at accuracy 10000; at production
    // group sizes the same check tightens to ±0.5% like q142), and the
    // head/tail fractions the approx cuts actually select must sit
    // within 0.08 of the nominal 0.25. The bucketing plumbing — |langs|
    // cut rows broadcast back, scan-side CASE — is identical to q146's.
    GraftQuery(
      "q149_perplexity_buckets_approx",
      (s, d) => {
        val docs = t(s, d, "documents")
        val scored = TextPipeline.bigramLogProb(docs)
          .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
        val bounds = scored.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            expr("approx_percentile(avg_neg_logprob, array(0.25D, 0.75D), 10000)").as("ap"),
            expr("percentile(avg_neg_logprob, array(0.20D, 0.30D, 0.70D, 0.80D))").as("ep"))
          .select(col("lang"), col("n_docs"),
            col("ap")(0).as("c1"), col("ap")(1).as("c2"),
            (col("ap")(0) >= col("ep")(0) && col("ap")(0) <= col("ep")(1))
              .as("c1_in_band"),
            (col("ap")(1) >= col("ep")(2) && col("ap")(1) <= col("ep")(3))
              .as("c2_in_band"))
        scored.join(broadcast(bounds), "lang")
          .select(col("lang"), col("n_docs"),
            col("c1_in_band"), col("c2_in_band"),
            when(col("avg_neg_logprob") <= col("c1"), 1.0).otherwise(0.0).as("is_head"),
            when(col("avg_neg_logprob") > col("c2"), 1.0).otherwise(0.0).as("is_tail"))
          .groupBy(col("lang"), col("n_docs"),
            col("c1_in_band"), col("c2_in_band"))
          .agg(
            (abs(avg(col("is_head")) - 0.25) <= 0.08).as("head_frac_ok"),
            (abs(avg(col("is_tail")) - 0.25) <= 0.08).as("tail_frac_ok"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     true AS c1_in_band, true AS c2_in_band,
                     true AS head_frac_ok, true AS tail_frac_ok
              FROM documents
              WHERE len(string_split_regex(trim(text), '\s+')) >= 2
              GROUP BY lang ORDER BY lang""")),

    // ---- PII scrubbing over log-shaped lines: redact the user id,
    // count redactions (null users redact nothing — the negative case
    // rides along). Patterns stay in the Java∩RE2 regex dialect.
    GraftQuery(
      "q70_pii_scrub",
      (s, d) => {
        val line = concat(lit("type="), col("event_type"), lit(" user="),
          coalesce(col("user_id").cast("string"), lit("-")))
        val (scrubbed, hits) = TextPipeline.redact(line, "user=[0-9]+", "user=[PII]")
        t(s, d, "events")
          .select(col("event_id"), scrubbed.as("scrubbed"), hits.as("n_redactions"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
                     regexp_replace('type=' || event_type || ' user=' || coalesce(CAST(user_id AS VARCHAR), '-'),
                                    'user=[0-9]+', 'user=[PII]', 'g') AS scrubbed,
                     len(regexp_extract_all('type=' || event_type || ' user=' || coalesce(CAST(user_id AS VARCHAR), '-'),
                                            'user=[0-9]+')) AS n_redactions
              FROM events ORDER BY event_id""")),

    // ---- column profiling (the data-quality dashboard aggregate):
    // totals, null counts, min/max/mean/stddev per numeric column in ONE
    // scan — stack melts the columns so the profile is a single
    // partial-aggregating groupBy on a 3-value key, not one scan per
    // column. stddev is the sample form in both engines.
    GraftQuery(
      "q71_profile",
      (s, d) => t(s, d, "lineitem")
        .selectExpr("stack(3, 'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice, 'l_discount', l_discount) as (col_name, v)")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("v")).as("n_nonnull"),
          round(min(col("v")), 6).as("vmin"),
          round(max(col("v")), 6).as("vmax"),
          round(avg(col("v")), 6).as("vavg"),
          round(stddev(col("v")), 6).as("vstd"))
        .orderBy(col("col_name")),
      Some("""SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(count(v) AS BIGINT) AS n_nonnull,
                     round(min(v), 6) AS vmin, round(max(v), 6) AS vmax,
                     round(avg(v), 6) AS vavg, round(stddev(v), 6) AS vstd
              FROM (SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
                    UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
                    UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
              GROUP BY col_name ORDER BY col_name""")),

    // ---- fixed-width histogram over event values (50-unit buckets):
    // one partial-aggregating groupBy on the bucket key.
    GraftQuery(
      "q72_histogram",
      (s, d) => t(s, d, "events")
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 2).as("lo"),
          round(max(col("value")), 2).as("hi"))
        .orderBy(col("bucket")),
      Some("""SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
                     CAST(count(*) AS BIGINT) AS n,
                     round(min(value), 2) AS lo, round(max(value), 2) AS hi
              FROM events GROUP BY 1 ORDER BY bucket NULLS FIRST""")),

    // ---- token-budget-aware mixing: three pseudo-sources (doc_id mod 3)
    // sampled to hit token budgets, not row shares — the way training
    // mixes are specified. Source c's budget exceeds its total, pinning
    // the keep-all clamp path. Rates derive from one-row token-total
    // aggregates broadcast back over each source; the gate stays a
    // deterministic scan-side hash filter.
    GraftQuery(
      "q85_token_budget_mix",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            size(Portable.tokens(col("text"))).cast("long").as("n_tokens"))
        def src(r: Int) = toks.filter(col("doc_id") % 3 === r)
        Sampling.mixByTokenBudget(Seq(
            ("web", src(0), 5000L), ("code", src(1), 3000L), ("books", src(2), 100000000L)))
          .orderBy(col("origin"), col("key"))
      },
      Some(s"""WITH toks AS (SELECT doc_id,
                                    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
                             FROM documents),
               g AS (SELECT doc_id, n_tokens, ${p60("CAST(doc_id AS VARCHAR)")} % 10000 AS slot
                     FROM toks),
               rates AS (SELECT CAST(doc_id % 3 AS INTEGER) AS grp,
                                least(10000, (CAST(CASE CAST(doc_id % 3 AS INTEGER)
                                                   WHEN 0 THEN 5000 WHEN 1 THEN 3000
                                                   ELSE 100000000 END AS BIGINT) * 10000) // sum(n_tokens)) AS rate
                         FROM toks GROUP BY 1)
               SELECT CASE grp WHEN 0 THEN 'web' WHEN 1 THEN 'code' ELSE 'books' END AS origin,
                      doc_id AS key, n_tokens
               FROM g JOIN rates ON CAST(g.doc_id % 3 AS INTEGER) = rates.grp
               WHERE slot < rate
               ORDER BY origin, key""")),

    // ---- cross-document duplicated-span ratio (the exact-substring-
    // dedup signal: per doc, the share of its 8-token window positions
    // occurring verbatim in another document). Positions, not shingle
    // sets — multiplicity counts.
    GraftQuery(
      "q80_dup_spans",
      (s, d) => TextPipeline.dupSpanRatio(t(s, d, "documents"), n = 8)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              wins AS (SELECT doc_id,
                              unnest([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]
                                      FOR i IN range(1, len(w) - 6)]) AS s
                       FROM toks WHERE len(w) >= 8),
              rep AS (SELECT s FROM
                        (SELECT s, count(DISTINCT doc_id) AS gdf FROM wins GROUP BY s)
                      WHERE gdf >= 2)
              SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                     CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
                     round(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_ratio
              FROM wins w LEFT JOIN rep r ON w.s = r.s
              GROUP BY w.doc_id ORDER BY doc_id""")),

    // ---- benchmark decontamination: deterministic pseudo-benchmark
    // (doc_id % 97 = 0) against the rest of the corpus as train; a train
    // doc is contaminated if it shares any 3-token gram with any
    // benchmark doc. The benchmark gram set broadcasts (eval sets are
    // MBs against a 100 TB corpus); the train side never shuffles for
    // the check itself.
    GraftQuery(
      "q81_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        TextPipeline.decontaminate(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0), n = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              wins AS (SELECT doc_id,
                              unnest([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
                       FROM toks WHERE len(w) >= 3),
              bench AS (SELECT DISTINCT s FROM wins WHERE doc_id % 97 = 0),
              tg AS (SELECT DISTINCT doc_id, s FROM wins WHERE doc_id % 97 <> 0),
              shared AS (SELECT tg.doc_id, count(b.s) AS n_shared
                         FROM tg LEFT JOIN bench b ON tg.s = b.s GROUP BY 1)
              SELECT d.doc_id,
                     CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared_grams,
                     coalesce(n_shared, 0) > 0 AS contaminated
              FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
              LEFT JOIN shared ON d.doc_id = shared.doc_id
              ORDER BY d.doc_id""")),

    // ---- Misra–Gries heavy hitters over the token stream: every token
    // above n/(k+1) frequency with its EXACT count, via sketch pass +
    // broadcast recount — never a full-vocabulary shuffle (the map-side
    // state is <= k counters per partition whatever the corpus size).
    // The oracle computes the same set the exhaustive way; matching it
    // value-for-value is precisely the sketch's superset guarantee.
    GraftQuery(
      "q86_heavy_hitters",
      (s, d) => MisraGries.heavyHitters(
          t(s, d, "documents").select(explode(Portable.tokens(col("text"))).as("tk")),
          col("tk"), k = 40)
        .orderBy(col("tk")),
      Some("""WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tk FROM documents),
              n AS (SELECT count(*) AS n_total FROM tok WHERE tk IS NOT NULL)
              SELECT tk, CAST(count(*) AS BIGINT) AS cnt FROM tok, n
              WHERE tk IS NOT NULL
              GROUP BY tk, n_total HAVING count(*) * 41 > n_total
              ORDER BY tk""")),

    // ---- q86's per-group form (MisraGries.heavyHittersPerGroup —
    // state math there): frequent tokens PER LANGUAGE, each group
    // thresholded against its own n. The per-(partition, group) state
    // is <= k counters, so the sketch pass ships k·|langs| entries
    // where the exact one-pass groupBy shuffles every (lang, token)
    // pair — the bounded-state-per-group shape every per-domain /
    // per-source frequency monitor needs at corpus scale. k=30 puts
    // the threshold at n/31 ≈ 3.2%, under each language's top-token
    // mass (3.7-4.1% across SFs), so the result is nonempty at every
    // driver SF. Exactness claim same as q86: superset guarantee +
    // broadcast recount.
    GraftQuery(
      "q154_heavy_hitters_per_lang",
      (s, d) => MisraGries.heavyHittersPerGroup(
          t(s, d, "documents").select(col("lang"),
            explode(Portable.tokens(col("text"))).as("tk")),
          col("lang"), col("tk"), k = 30)
        .select(col("grp").as("lang"), col("tk"), col("cnt"))
        .orderBy(col("lang"), col("tk")),
      Some("""WITH tok AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS tk
                           FROM documents),
              n AS (SELECT lang, count(*) AS n_total FROM tok
                    WHERE tk IS NOT NULL GROUP BY 1)
              SELECT tok.lang, tk, CAST(count(*) AS BIGINT) AS cnt
              FROM tok JOIN n USING (lang)
              WHERE tk IS NOT NULL
              GROUP BY tok.lang, tk, n_total
              HAVING count(*) * 31 > n_total
              ORDER BY lang, tk""")),

    // ---- priority sampling (Duffield–Lund–Thorup): 100 documents
    // weighted by token count, each with its Horvitz–Thompson estimation
    // weight ŵ = max(w, τ). The uniform draw is a dyadic rational from
    // the top 52 hash bits and the priority is one IEEE division, so
    // both engines rank bit-identical doubles — a cross-engine-exact
    // WEIGHTED sample, which df.sample() cannot be even unweighted.
    GraftQuery(
      "q87_priority_sample",
      (s, d) => Sampling.prioritySample(
          t(s, d, "documents")
            .select(col("doc_id"), size(Portable.tokens(col("text"))).as("n_toks")),
          key = col("doc_id"), weight = col("n_toks"), k = 100)
        .orderBy(col("rn")),
      Some(s"""WITH w AS (SELECT doc_id AS key,
                                 CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS w
                          FROM documents),
               pri AS (SELECT key, w,
                              w / (((${p60("CAST(key AS VARCHAR)")} // 256) + 0.5)
                                   / 4503599627370496.0) AS priority
                       FROM w),
               top AS (SELECT key, w, priority FROM pri ORDER BY priority DESC, key LIMIT 101),
               ranked AS (SELECT key, w, priority,
                                 row_number() OVER (ORDER BY priority DESC, key) AS rn
                          FROM top),
               tau AS (SELECT coalesce(max(CASE WHEN rn = 101 THEN priority END), 0.0) AS tau
                       FROM ranked)
               SELECT key, w, CAST(rn AS INTEGER) AS rn, round(priority, 6) AS priority,
                      round(greatest(w, tau), 6) AS w_hat
               FROM ranked, tau WHERE rn <= 100 ORDER BY rn""")),

    // ---- intra-document repetition (Gopher-family filters): duplicate
    // bigram share and top-bigram share per doc. Shuffles key on
    // (doc, gram) then doc — skew bounded by document length.
    GraftQuery(
      "q82_repetition",
      (s, d) => TextPipeline.repetition(t(s, d, "documents"), n = 2)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              wins AS (SELECT doc_id,
                              unnest([w[i]||' '||w[i+1] FOR i IN range(1, len(w))]) AS s
                       FROM toks WHERE len(w) >= 2),
              cnt AS (SELECT doc_id, s, count(*) AS c FROM wins GROUP BY 1, 2)
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                     round(max(c) * 1.0 / sum(c), 6) AS top_ratio,
                     round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6) AS dup_ratio
              FROM cnt GROUP BY doc_id ORDER BY doc_id""")),

    // ---- deterministic train/val/test split (98/1/1): assignment is a
    // pure function of the doc id's hash, so it is stable across runs,
    // partitionings, engines and re-ingests — the property that keeps
    // val/test leak-free as the corpus grows (a doc NEVER migrates
    // between splits when unrelated docs are added, unlike
    // randomSplit). Scan-side projection, one aggregate for the counts.
    GraftQuery(
      "q95_dataset_split",
      (s, d) => {
        val slot = pmod(Portable.p60(col("doc_id").cast("string")), lit(10000))
        t(s, d, "documents")
          .select(when(slot < 9800, "train").when(slot < 9900, "val")
            .otherwise("test").as("split"), col("lang"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("split"), col("lang"))
      },
      Some(s"""SELECT CASE WHEN slot < 9800 THEN 'train'
                           WHEN slot < 9900 THEN 'val' ELSE 'test' END AS split,
                      lang, CAST(count(*) AS BIGINT) AS n
               FROM (SELECT lang, ${p60("CAST(doc_id AS VARCHAR)")} % 10000 AS slot
                     FROM documents)
               GROUP BY 1, 2 ORDER BY split, lang""")),

    // ---- GPT-style sequence packing: the corpus token stream (doc-id
    // order) cut every 256 tokens; one row per (doc, sequence) span with
    // the span's offset inside its sequence. The global prefix sum is
    // two-level (bucketed window + broadcast bucket offsets), never a
    // whole-corpus single-task window; the oracle computes the same
    // offsets with DuckDB's global window, pinning the two-level
    // decomposition's exactness. bucketWidth 64 forces multiple buckets
    // even at sf0.01, so the bucket-offset path is what's checked.
    GraftQuery(
      "q89_sequence_packing",
      (s, d) => TextPipeline.pack(t(s, d, "documents"),
          seqLen = 256, bucketWidth = 64)
        .orderBy(col("doc_id"), col("seq_id")),
      Some("""WITH toks AS (SELECT doc_id,
                                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
                            FROM documents),
              o AS (SELECT doc_id, n,
                           CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                             AS BIGINT) AS off
                    FROM toks WHERE n > 0),
              sp AS (SELECT doc_id, n, off,
                            unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq_id
                     FROM o)
              SELECT doc_id, seq_id,
                     greatest(off, seq_id * 256) - seq_id * 256 AS pos,
                     least(off + n, (seq_id + 1) * 256) - greatest(off, seq_id * 256) AS n_tok
              FROM sp ORDER BY doc_id, seq_id""")),

    // ---- vocabulary coverage curve (tokenizer-design telemetry): what
    // fraction of all token OCCURRENCES the top-N most frequent terms
    // cover, at N ∈ {10, 100, 1000}. The term-frequency aggregate is the
    // scale work and it partial-aggregates on the term key; only the
    // top max-N terms can ever contribute to the curve, so the cut is a
    // distributed top-1000 (orderBy+limit = TakeOrderedAndProject:
    // per-partition heads merged on the driver side of the exchange, no
    // global sort) and the ranking window then runs over that
    // constant-size frame — never over the full vocab, which on a
    // web-scale corpus is billions of distinct tokens and would
    // single-task an unpartitioned window. Ties (equal counts) break by
    // term so the cut is engine-deterministic.
    GraftQuery(
      "q97_vocab_coverage",
      (s, d) => {
        val tf = t(s, d, "documents")
          .select(explode(Portable.tokens(col("text"))).as("term"))
          .filter(length(col("term")) > 0)
          .groupBy(col("term")).agg(count(lit(1)).as("c"))
        val top = tf.orderBy(col("c").desc, col("term")).limit(1000)
        // window over the 1000-row top frame only — a deliberate
        // single-task step over a constant-size input (the same defense
        // Sampling.prioritySample uses for its k+1-row rank)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("term"))
        val ranked = top.select(col("c"), row_number().over(w).as("rk"))
        val sizesDf = {
          import org.apache.spark.sql.Row
          import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
          s.createDataFrame(
            java.util.Arrays.asList(Row(10), Row(100), Row(1000)),
            StructType(Seq(StructField("vocab_size", IntegerType, nullable = false))))
        }
        val total = tf.agg(sum(col("c")).as("total"))
        ranked.join(broadcast(sizesDf), col("rk") <= col("vocab_size"))
          .groupBy(col("vocab_size"))
          .agg(max(col("rk")).cast("long").as("n_terms"),
            sum(col("c")).as("covered_tokens"))
          .crossJoin(broadcast(total))
          .select(col("vocab_size"), col("n_terms"), col("covered_tokens"),
            col("total").as("total_tokens"),
            round(col("covered_tokens") / col("total"), 6).as("coverage"))
          .orderBy(col("vocab_size"))
      },
      Some("""WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
                           FROM documents),
              tf AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                     FROM tok WHERE len(term) > 0 GROUP BY 1),
              ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk
                         FROM tf),
              tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tf)
              SELECT v.vocab_size, CAST(max(rk) AS BIGINT) AS n_terms,
                     CAST(sum(c) AS BIGINT) AS covered_tokens,
                     CAST(max(total) AS BIGINT) AS total_tokens,
                     round(sum(c) * 1.0 / max(total), 6) AS coverage
              FROM ranked, tot, (VALUES (10), (100), (1000)) v(vocab_size)
              WHERE rk <= v.vocab_size
              GROUP BY 1 ORDER BY vocab_size""")),

    // ---- mergeable quantile sketch (fixed-width-bin histogram form):
    // one sketch per event_type shard — a (bin, count) frame, the
    // deterministic cousin of q91's HLL shards — merged by summing
    // counts, then quantiles read off the merged CDF (estimate = upper
    // edge of the first bin whose cumulative count reaches ceil(q·N);
    // error bounded by the bin width, here 5.0). The per-shard build is
    // a partial-aggregating groupBy; the merge touches only |bins| rows;
    // the CDF is a TWO-LEVEL prefix sum (Prefix.runningSum) because the
    // bin count scales with the VALUE RANGE, not the corpus — a heavy-
    // tailed metric makes "bounded bin domain" the same trap q97's
    // "bounded vocab" was, so no single task ever sees more than one
    // bucket of bins. This is the keep-per-day-histograms,
    // answer-global-percentiles-without-rescanning pattern.
    GraftQuery(
      "q98_quantile_sketch",
      (s, d) => {
        val shardSketch = t(s, d, "events")
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"),
            floor(col("value") / 5).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"))
        val merged = shardSketch.groupBy(col("bin")).agg(sum(col("n")).as("n"))
        val cdf = graft.ops.Prefix.runningSum(merged, "bin", "n")
          .select(col("bin"), col("cum"))
          .crossJoin(broadcast(merged.agg(sum(col("n")).as("total"))))
        val qsDf = {
          import org.apache.spark.sql.Row
          import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
          s.createDataFrame(
            java.util.Arrays.asList(Row(0.25), Row(0.5), Row(0.9), Row(0.99)),
            StructType(Seq(StructField("q", DoubleType, nullable = false))))
        }
        cdf.join(broadcast(qsDf), col("cum") >= ceil(col("q") * col("total")))
          .groupBy(col("q"))
          .agg(max(col("total")).as("n_total"), min(col("bin")).as("qbin"))
          .select(col("q"), col("n_total"), col("qbin"),
            round((col("qbin") + 1) * 5.0, 2).as("est"))
          .orderBy(col("q"))
      },
      Some("""WITH sk AS (SELECT event_type, CAST(floor(value / 5) AS BIGINT) AS bin,
                                 CAST(count(*) AS BIGINT) AS n
                          FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
              g AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n FROM sk GROUP BY 1),
              cdf AS (SELECT bin, CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum
                      FROM g),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
              SELECT CAST(q AS DOUBLE) AS q, CAST(max(total) AS BIGINT) AS n_total,
                     CAST(min(bin) AS BIGINT) AS qbin,
                     round((min(bin) + 1) * 5.0, 2) AS est
              FROM cdf, tot, (VALUES (0.25), (0.5), (0.9), (0.99)) v(q)
              WHERE cum >= ceil(CAST(q AS DOUBLE) * total)
              GROUP BY q ORDER BY q""")),

    // ---- epoch-based source upsampling (the "3.7 epochs of the
    // high-quality source" mixing idiom): every doc repeated for each
    // full epoch plus a hash-gated half epoch, tagged with the epoch
    // index. Map-side explode over a constant sequence — no shuffle, no
    // driver state — and the fractional pass is the deterministic gate,
    // so the mix replays identically across runs/engines/layouts.
    GraftQuery(
      "q102_epoch_upsample",
      (s, d) => Sampling.epochUpsample(
          t(s, d, "documents").select(col("doc_id"),
            size(Portable.tokens(col("text"))).cast("long").as("n_tokens")),
          key = col("doc_id"), fullEpochs = 2, fracBp = 5000)
        .orderBy(col("epoch"), col("doc_id")),
      Some(s"""SELECT doc_id,
                      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                      epoch
               FROM documents, (VALUES (0), (1), (2)) e(epoch)
               WHERE epoch < 2 OR ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < 5000
               ORDER BY epoch, doc_id""")),

    // ---- length-bucketed batching telemetry: per 32-token length
    // bucket, doc/token counts and the padding waste of batching within
    // the bucket (pad to bucket max) — the numbers that justify
    // length-bucketed batching against pad-to-global-max. Scan-side
    // projection + one partial agg on the bounded bucket key.
    GraftQuery(
      "q103_length_buckets",
      (s, d) => TextPipeline.lengthBuckets(t(s, d, "documents"), widthTokens = 32)
        .orderBy(col("bucket")),
      Some("""WITH tk AS (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
                          FROM documents),
              b AS (SELECT n, (n - 1) // 32 AS bucket FROM tk WHERE n > 0)
              SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS n_tokens,
                     CAST(max(n) AS BIGINT) AS max_len,
                     CAST(count(*) * max(n) - sum(n) AS BIGINT) AS pad_tokens,
                     CAST((count(*) * max(n) - sum(n)) * 1000000 // (count(*) * max(n)) AS BIGINT) AS pad_ppm
              FROM b GROUP BY bucket ORDER BY bucket""")),

    // ---- the COMPLETE corpus-build pipeline, end to end: quality gate
    // (>= 10 tokens) → benchmark decontamination (trigram overlap vs the
    // doc_id % 97 = 0 eval set) → exact dedup (normalized fingerprint)
    // → NEAR-dup canonical retention (df-capped shingle jaccard >= 0.1
    // → connected components → best-token-count doc per component) →
    // 256-token sequence packing of the survivors. Every stage is the
    // library op the standalone queries already verify (q65, q81, q34,
    // q83, q89) — this registration pins that they COMPOSE: each
    // stage's survivors feed the next, one driver-checkable output. The
    // plan is the stages' plans chained — scan-side gates, one shuffle
    // per dedup family, the pointer-jumping CC loop, the two-level
    // pack — nothing new at scale beyond what each piece already
    // defends.
    GraftQuery(
      "q104_corpus_pipeline",
      (s, d) => {
        val docs = t(s, d, "documents")
        val quality = docs
          .filter(size(Portable.tokens(col("text"))) >= 10)
          .select(col("doc_id"), col("text"))
        val train = quality.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        val clean = train.join(
          TextPipeline.decontaminate(train, bench, n = 3)
            .filter(!col("contaminated")).select(col("doc_id")), "doc_id")
        // stage boundary: exact-dedup survivors feed three consumers
        // (shingle pairs, scoring, the final join) — uncached, each
        // re-evaluates the decontamination join + dedup groupBy.
        // MEMORY_AND_DISK semantics; a production run would checkpoint
        // survivors to parquet here for restartability anyway.
        val exactKept = graft.ops.Dedup.exact(clean)
          .select(col("doc_id"), col("text")).cache()
        val comps = graft.ops.Dedup.connectedComponents(
          graft.ops.Dedup.jaccardPairs(
            graft.ops.Dedup.shingles(exactKept, maxShingleDf = 1000), minJaccard = 0.1)
            .select(col("d1"), col("d2")))
        val scored = exactKept.select(col("doc_id"),
          size(Portable.tokens(col("text"))).as("score"))
        val canon = graft.ops.Dedup.canonical(scored, comps)
          .filter(col("keep")).select(col("doc_id"))
        TextPipeline.pack(exactKept.join(canon, "doc_id"),
            seqLen = 256, bucketWidth = 64)
          .orderBy(col("doc_id"), col("seq_id"))
      },
      Some(s"""WITH RECURSIVE
               toks AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents),
               wins AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                               FOR i IN range(1, len(w) - 1)]) AS s
                        FROM toks WHERE len(w) >= 3),
               bench AS (SELECT DISTINCT s FROM wins WHERE doc_id % 97 = 0),
               contam AS (SELECT DISTINCT doc_id FROM wins JOIN bench USING (s)
                          WHERE doc_id % 97 <> 0),
               clean AS (SELECT doc_id, text, w FROM toks
                         WHERE len(w) >= 10 AND doc_id % 97 <> 0
                           AND doc_id NOT IN (SELECT doc_id FROM contam)),
               nf AS (SELECT doc_id, text, w,
                             ${p60(Portable.normTextSql("text"))} AS fp FROM clean),
               ex AS (SELECT doc_id, text, w FROM nf
                      WHERE doc_id = (SELECT min(doc_id) FROM nf n2 WHERE n2.fp = nf.fp)),
               sh0 AS (SELECT DISTINCT doc_id, s FROM
                       (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                               FOR i IN range(1, len(w) - 1)]) AS s
                        FROM ex WHERE len(w) >= 3)),
               sh AS (SELECT doc_id, s FROM
                       (SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh0)
                      WHERE df <= 1000),
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
                         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                         GROUP BY 1, 2),
               pairs AS (SELECT d1, d2 FROM
                           (SELECT d1, d2, round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
                            FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id)
                         WHERE jaccard >= 0.1),
               edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                         UNION ALL SELECT d2, d1 FROM pairs),
               reach(node, r) AS (
                 SELECT DISTINCT a, a FROM edges
                 UNION
                 SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
               comp AS (SELECT node AS id, min(r) AS component FROM reach GROUP BY node),
               lab AS (SELECT ex.doc_id, coalesce(c.component, ex.doc_id) AS component,
                              CAST(len(w) AS BIGINT) AS n
                       FROM ex LEFT JOIN comp c ON c.id = ex.doc_id),
               canon AS (SELECT doc_id, n FROM
                           (SELECT doc_id, n, row_number() OVER (PARTITION BY component
                              ORDER BY n DESC, doc_id) AS rn FROM lab)
                         WHERE rn = 1),
               o AS (SELECT doc_id, n,
                            CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                              AS BIGINT) AS off
                     FROM canon WHERE n > 0),
               sp AS (SELECT doc_id, n, off,
                             unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq_id
                      FROM o)
               SELECT doc_id, seq_id,
                      greatest(off, seq_id * 256) - seq_id * 256 AS pos,
                      least(off + n, (seq_id + 1) * 256) - greatest(off, seq_id * 256) AS n_tok
               FROM sp ORDER BY doc_id, seq_id""")),

    // ---- the q104 funnel instrumented with Telemetry.observed (the
    // zero-extra-pass monitoring idiom, until now spec-only): per-stage
    // survivor counts ride the ONE action that materializes the final
    // stage — CollectMetrics nodes are accumulator-backed and survive
    // the optimizer, so quality/decontaminated/exact-dedup counts cost
    // no re-scan (contrast: three separate stage .count()s would read
    // the corpus three more times — at 100 TB, the difference between
    // monitoring and tripling the bill). The emitted frame is the
    // driver-side metric row reshaped; the oracle recomputes each
    // stage's predicate as an independent SQL count.
    GraftQuery(
      "q124_funnel_observe",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        // observe semantics: a CollectMetrics node accumulates once per
        // EXECUTION of its subtree, and decontaminate / Dedup.exact each
        // consume their input twice (self-referencing joins). So the
        // observed frames form a strictly LINEAR spine — base → clean
        // survivors → exact survivors, each consumed exactly once — and
        // the stage decisions (contaminated ids, dedup keep set) come in
        // as un-observed side branches joined onto the spine.
        val base = docs.filter(size(Portable.tokens(col("text"))) >= 10)
          .select(col("doc_id"), col("text"))
        val train = base.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        val cleanIds = TextPipeline.decontaminate(train, bench, n = 3)
          .filter(!col("contaminated")).select(col("doc_id"))
        val exactIds = graft.ops.Dedup.exact(train.join(cleanIds, "doc_id"))
          .select(col("doc_id"))
        val (quality, qObs) = graft.ops.Telemetry.observed(
          base, "q124_quality", count(lit(1)).as("rows"))
        val (clean, cObs) = graft.ops.Telemetry.observed(
          quality.filter(pmod(col("doc_id"), lit(97)) =!= 0)
            .select(col("doc_id")).join(cleanIds, "doc_id"),
          "q124_clean", count(lit(1)).as("rows"))
        val (exact, eObs) = graft.ops.Telemetry.observed(
          clean.join(exactIds, "doc_id"),
          "q124_exact", count(lit(1)).as("rows"))
        // the one deliberate action: materializes the final stage and,
        // with it, every spine observation in the same pass
        exact.foreach((_: org.apache.spark.sql.Row) => ())
        def n(o: org.apache.spark.sql.Observation): Long =
          o.get.apply("rows").asInstanceOf[Long]
        Seq(("1_quality", n(qObs)), ("2_decontaminated", n(cObs)),
            ("3_exact_dedup", n(eObs)))
          .toDF("stage", "n_rows").orderBy(col("stage"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
               wins AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                               FOR i IN range(1, len(w) - 1)]) AS s
                        FROM toks WHERE len(w) >= 3),
               bench AS (SELECT DISTINCT s FROM wins WHERE doc_id % 97 = 0),
               contam AS (SELECT DISTINCT doc_id FROM wins JOIN bench USING (s)
                          WHERE doc_id % 97 <> 0),
               q AS (SELECT doc_id FROM toks WHERE len(w) >= 10),
               clean AS (SELECT doc_id FROM toks
                         WHERE len(w) >= 10 AND doc_id % 97 <> 0
                           AND doc_id NOT IN (SELECT doc_id FROM contam)),
               ex AS (SELECT count(DISTINCT ${p60(Portable.normTextSql("text"))}) AS n
                      FROM documents JOIN clean USING (doc_id))
               SELECT stage, n_rows FROM (
                 SELECT '1_quality' AS stage, CAST(count(*) AS BIGINT) AS n_rows FROM q
                 UNION ALL
                 SELECT '2_decontaminated', CAST(count(*) AS BIGINT) FROM clean
                 UNION ALL
                 SELECT '3_exact_dedup', CAST(n AS BIGINT) FROM ex)
               ORDER BY stage""")),

    // ---- Z-order (Morton) layout audit: bucket the corpus on two
    // pruning dimensions (length bucket × source-hash bucket), interleave
    // them into the Morton key (graft.functions.ZOrder2 — the key
    // Delta/Iceberg sort by for OPTIMIZE ZORDER), assign fixed-width
    // z-ranges as "files" (zkey >> 10: 64 files of 1024 z-cells = 32×32
    // rectangles), and report each file's bounding box + row count — the
    // min/max skipping stats a scan would prune with. Everything is a
    // scan-side projection except one partial agg on the bounded file id;
    // at 100 TB the real layout step is repartitionByRange(zkey) + write,
    // and THIS query is its audit: tight per-file boxes on both dims ⇒
    // two-sided range predicates prune to O(matching cells) files.
    GraftQuery(
      "q106_zorder_layout",
      (s, d) => t(s, d, "documents")
        .select(
          expr("least(CAST(255 AS BIGINT), n_chars div 64)").as("xb"),
          pmod(expr("p60(source)"), lit(256L)).as("yb"))
        .withColumn("file_id", expr("zorder2(xb, yb, 8) div 1024"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
          min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
        .orderBy(col("file_id")),
      Some(s"""WITH b AS (SELECT least(255, n_chars // 64) AS xb,
                                 ${p60("source")} % 256 AS yb
                          FROM documents),
               z AS (SELECT xb, yb,
                            ${graft.functions.ZOrder2.interleaveSql("xb", "yb", 8)} // 1024 AS file_id
                     FROM b)
               SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
                      min(xb) AS x_min, max(xb) AS x_max,
                      min(yb) AS y_min, max(yb) AS y_max
               FROM z GROUP BY file_id ORDER BY file_id""")),

    // ---- the WRITE side of z-order, driver-visible (q106 audits the
    // key's geometry; ZOrderSpec proves file pruning on real parquet
    // min/max; THIS pins data integrity through the layout op): docs
    // bucketed on (length, source-hash), Layout.zorder → parquet with
    // bounded file size → read back under the two-sided range predicate
    // the layout exists to serve. The oracle computes the same predicate
    // on the base table, so any row lost/duplicated/mangled by the
    // range-exchange + sortWithinPartitions + write + read cycle is a
    // hash mismatch. (File-count pruning stays spec-side: range
    // boundaries are sampled, so WHICH files match is not cross-engine
    // deterministic — row content is.)
    GraftQuery(
      "q125_zorder_roundtrip",
      (s, d) => {
        val dir = Scratch.dir("graft_zorder", d)
        val docs = t(s, d, "documents").select(
          col("doc_id"), col("n_chars"),
          expr("least(CAST(15 AS BIGINT), n_chars div 32)").as("xb"),
          pmod(expr("p60(source)"), lit(16L)).as("yb"))
        graft.ops.Layout.zorder(docs, col("xb"), col("yb"), bits = 4, numRanges = 8)
          .write.mode("overwrite").option("maxRecordsPerFile", 64).parquet(dir)
        s.read.parquet(dir)
          .filter(col("xb").between(4, 9) && col("yb").between(4, 11))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("doc_id")).as("n_distinct"),
            sum(col("n_chars")).as("chars_total"),
            sum(col("doc_id")).as("id_sum"))
      },
      Some(s"""WITH b AS (SELECT doc_id, n_chars,
                                 least(15, n_chars // 32) AS xb,
                                 ${p60("source")} % 16 AS yb
                          FROM documents)
               SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                      CAST(sum(n_chars) AS BIGINT) AS chars_total,
                      CAST(sum(doc_id) AS BIGINT) AS id_sum
               FROM b WHERE xb BETWEEN 4 AND 9 AND yb BETWEEN 4 AND 11""")),

    // ---- α=1/2 temperature source mixing (Sampling.sqrtTempRates /
    // sqrtTempSample — the multilingual-corpus rebalancing convention:
    // sample ∝ n^α so small sources stop drowning; α=1/2 keeps the
    // smallest source whole and downsamples the rest by the sqrt
    // ratio). Rates are exact integer basis points (isqrt + floored
    // quotient — see the op's exactness argument), the gate is the
    // standard p60 hash ring. Two corpus passes inherent (stats, then
    // gate); rates themselves are a |sources|-row broadcast. The extra
    // stats join here is presentation (in/kept side by side).
    // Zero-token sources are excluded from the rates frame (the op's
    // empty-source policy — one zero-mass source would otherwise floor
    // every rate to 0); both oracles mirror it with HAVING.
    GraftQuery(
      "q132_temperature_mix",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(Portable.tokens(col("text"))).cast("long").as("n_toks"))
        val in = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs_in"), sum(col("n_toks")).as("n_tokens_in"))
        val rates = Sampling.sqrtTempRates(docs, col("source"), col("n_toks"))
          .select(col("source"), col("rate_bp"))
        val kept = docs.join(broadcast(rates), "source")
          .filter(Sampling.hashGate(col("doc_id"), col("rate_bp")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_toks")).as("n_tokens_kept"))
        in.join(rates, "source").join(kept, Seq("source"), "left")
          .select(col("source"), col("n_docs_in"), col("n_tokens_in"),
            col("rate_bp"),
            coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
            coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
          .orderBy(col("source"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source,
                      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
               FROM documents),
               st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_in,
                             CAST(sum(n_toks) AS BIGINT) AS n_tokens_in,
                             CAST(floor(sqrt(CAST(sum(n_toks) AS DOUBLE))) AS BIGINT) AS isq
                      FROM d GROUP BY 1
                      HAVING sum(n_toks) > 0),
               r AS (SELECT source, n_docs_in, n_tokens_in,
                            least(10000, (10000 * (SELECT min(isq) FROM st)) // isq) AS rate_bp
                     FROM st),
               k AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs_kept,
                            CAST(sum(d.n_toks) AS BIGINT) AS n_tokens_kept
                     FROM d JOIN r USING (source)
                     WHERE ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < rate_bp
                     GROUP BY 1)
               SELECT r.source, r.n_docs_in, r.n_tokens_in,
                      CAST(r.rate_bp AS BIGINT) AS rate_bp,
                      CAST(coalesce(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
                      CAST(coalesce(k.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
               FROM r LEFT JOIN k USING (source) ORDER BY source""")),

    // ---- the ROUND'S new curation ops composed end to end (the q104
    // pattern for this family): span scrub (q131's passage dedup, kept
    // docs only) → α=1/2 temperature mixing over the CLEANED token mass
    // (q132's exact-integer rates on post-scrub counts — mixing after
    // cleaning, the real pipeline order) → 256-token sequence packing
    // of the survivors (q89's two-level pack). Each stage is the
    // already-verified library op; this registration pins that they
    // compose — scrubbing changes the token mass that sets the mix
    // rates, mixing changes which docs pack, and the oracle recomputes
    // the whole chain independently.
    GraftQuery(
      "q137_curation_pipeline",
      (s, d) => {
        val docs = t(s, d, "documents")
        val clean = TextPipeline.scrubSharedSpans(docs, windowTokens = 10, minDocs = 2)
          .filter(col("n_kept") > 0)
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .select(col("doc_id"), col("source"), col("clean_text"),
            size(Portable.tokens(col("clean_text"))).cast("long").as("n_toks"))
        val rates = Sampling.sqrtTempRates(clean, col("source"), col("n_toks"))
          .select(col("source"), col("rate_bp"))
        val mixed = clean.join(broadcast(rates), "source")
          .filter(Sampling.hashGate(col("doc_id"), col("rate_bp")))
        TextPipeline.pack(mixed, seqLen = 256, bucketWidth = 64,
            textCol = "clean_text")
          .orderBy(col("doc_id"), col("seq_id"))
      },
      Some(s"""WITH toks0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                              FROM documents),
               spans AS (SELECT doc_id, i AS idx,
                                array_to_string(w[i*10+1 : i*10+10], ' ') AS span,
                                len(w[i*10+1 : i*10+10]) AS sp_n
                         FROM (SELECT doc_id, w,
                                      unnest(range(0, (len(w) - 1) // 10 + 1)) AS i
                               FROM toks0 WHERE len(w) > 0)),
               shared AS (SELECT span FROM
                            (SELECT span, count(DISTINCT doc_id) AS ndocs
                             FROM spans GROUP BY 1)
                          WHERE ndocs >= 2),
               kept AS (SELECT doc_id, CAST(sum(sp_n) AS BIGINT) AS n
                        FROM spans WHERE span NOT IN (SELECT span FROM shared)
                        GROUP BY doc_id),
               src AS (SELECT k.doc_id, d.source, k.n
                       FROM kept k JOIN documents d USING (doc_id)),
               st AS (SELECT source,
                             CAST(floor(sqrt(CAST(sum(n) AS DOUBLE))) AS BIGINT) AS isq
                      FROM src GROUP BY 1
                      HAVING sum(n) > 0),
               r AS (SELECT source,
                            least(10000, (10000 * (SELECT min(isq) FROM st)) // isq) AS rate_bp
                     FROM st),
               mixed AS (SELECT s2.doc_id, s2.n
                         FROM src s2 JOIN r USING (source)
                         WHERE ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < rate_bp),
               o AS (SELECT doc_id, n,
                            CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                              AS BIGINT) AS off
                     FROM mixed WHERE n > 0),
               sp AS (SELECT doc_id, n, off,
                             unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq_id
                      FROM o)
               SELECT doc_id, seq_id,
                      greatest(off, seq_id * 256) - seq_id * 256 AS pos,
                      least(off + n, (seq_id + 1) * 256) - greatest(off, seq_id * 256) AS n_tok
               FROM sp ORDER BY doc_id, seq_id""")),

    // ---- winsorization (percentile clipping): per-type p01/p99 value
    // bounds, values clipped into [p01, p99], then the cleaned stats —
    // the standard outlier-hygiene step before a numeric column feeds
    // training or a drift monitor (one corrupted 1e12 reading must not
    // own the mean). Exact interpolated percentiles here because they
    // are oracle-checkable (the q28 convention, matching DuckDB
    // quantile_cont); at 100 TB swap the bounds source for the q98
    // mergeable quantile sketch — the clip plumbing (tiny bounds frame
    // broadcast back, scan-side greatest/least) is identical. The
    // bounds frame is |types| rows; the clip pass is one scan.
    GraftQuery(
      "q129_winsorize",
      (s, d) => {
        val ev = t(s, d, "events")
        val pct = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.01)").as("p01"),
            expr("percentile(value, 0.99)").as("p99"))
        ev.join(broadcast(pct), "event_type")
          .select(col("event_type"),
            greatest(col("p01"), least(col("p99"), col("value"))).as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("v")), 6).as("mean_winsorized"),
            round(min(col("v")), 6).as("v_min"),
            round(max(col("v")), 6).as("v_max"))
          .orderBy(col("event_type"))
      },
      Some("""WITH p AS (SELECT event_type,
                                quantile_cont(value, 0.01) AS p01,
                                quantile_cont(value, 0.99) AS p99
                         FROM events GROUP BY 1)
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     round(avg(greatest(p01, least(p99, value))), 6) AS mean_winsorized,
                     round(min(greatest(p01, least(p99, value))), 6) AS v_min,
                     round(max(greatest(p01, least(p99, value))), 6) AS v_max
              FROM events JOIN p USING (event_type)
              GROUP BY event_type ORDER BY event_type""")),

    // ---- robust outlier detection via MAD (median absolute deviation
    // — the Hampel/robust-statistics identifier; the breakdown-point
    // upgrade over q129's percentile clips and any mean±kσ rule, which
    // the outliers themselves drag): per event type, flag values
    // outside median ± 3·MAD and report the flagged count and rate.
    // Two grouped percentile passes (the median, then the median of
    // absolute deviations — MAD is not one-pass decomposable) + one
    // |types|-row broadcast back; at 100 TB both medians swap to the
    // q142 approx_percentile sketch with the same plumbing. Medians
    // are exact interpolated percentiles — integer-position arithmetic
    // both engines (the q28/q129 convention), so the flags are exact,
    // not band-checked.
    GraftQuery(
      "q155_mad_outliers",
      (s, d) => {
        val ev = t(s, d, "events")
        val med = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5D)").as("med"))
        val mad = ev.join(broadcast(med), "event_type")
          .groupBy(col("event_type"), col("med"))
          .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
        ev.join(broadcast(mad), "event_type")
          .select(col("event_type"), col("med"), col("mad"),
            (abs(col("value") - col("med")) > col("mad") * 3).cast("long")
              .as("is_out"))
          .groupBy(col("event_type"), col("med"), col("mad"))
          .agg(count(lit(1)).as("n"), sum(col("is_out")).as("n_out"))
          .select(col("event_type"), col("n"), col("n_out"),
            round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
            round(col("n_out").cast("double") / col("n"), 6).as("out_rate"))
          .orderBy(col("event_type"))
      },
      Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                           FROM events GROUP BY 1),
              mad AS (SELECT event_type, any_value(med) AS med,
                             quantile_cont(abs(value - med), 0.5) AS mad
                      FROM events JOIN med USING (event_type) GROUP BY event_type)
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN abs(value - med) > mad * 3
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
                     round(any_value(med), 6) AS med,
                     round(any_value(mad), 6) AS mad,
                     round(sum(CASE WHEN abs(value - med) > mad * 3
                               THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS out_rate
              FROM events JOIN mad USING (event_type)
              GROUP BY event_type ORDER BY event_type""")),

    // ---- distribution drift per source: PSI (population stability
    // index) of each source's stop-ratio histogram against the whole
    // corpus — the monitoring number that flags a crawl whose quality
    // profile shifted (PSI >= 0.2 is the classic "investigate"
    // threshold). Binning is a scan-side projection; every aggregate is
    // over (source × 10 bins) — bounded regardless of corpus size; the
    // full grid is materialized (sources × bins cross join) so empty
    // bins participate via +1 Laplace smoothing instead of vanishing.
    // ln with the identical operation shape both engines, round 6dp
    // (the q99 convention).
    GraftQuery(
      "q115_source_drift",
      (s, d) => {
        val binned = t(s, d, "documents")
          .select(col("source"), Portable.tokens(col("text")).as("w"))
          .filter(size(col("w")) > 0)
          .select(col("source"),
            least(lit(9), floor(
              expr(s"size(filter(w, t -> t IN (${TextQueries.stopListSql})))")
                .cast("double") / size(col("w")) * 10).cast("int")).as("bin"))
        // ONE corpus-scale aggregate: (source × bin) counts are the
        // sufficient statistic — row totals, bin totals, the grand total
        // and the full grid all derive from this tiny (|sources|×10)
        // frame, so the corpus is scanned exactly once however many
        // views the PSI needs
        val perSrc = binned.groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_sb")).cache()
        val bins = binned.sparkSession.range(0, 10)
          .select(col("id").cast("int").as("bin"))
        val full = perSrc.select(col("source")).distinct().crossJoin(bins)
        val srcTot = perSrc.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
        val perBin = perSrc.groupBy(col("bin")).agg(sum(col("n_sb")).as("n_b"))
        full
          .join(perSrc, Seq("source", "bin"), "left").na.fill(0L, Seq("n_sb"))
          .join(srcTot, "source")
          .join(perBin, Seq("bin"), "left").na.fill(0L, Seq("n_b"))
          .crossJoin(broadcast(perSrc.agg(sum(col("n_sb")).as("n"))))
          .select(col("source"), col("n_s"),
            ((col("n_sb") + 1).cast("double") / (col("n_s") + 10)).as("p"),
            ((col("n_b") + 1).cast("double") / (col("n") + 10)).as("q"))
          .groupBy(col("source"))
          .agg(max(col("n_s")).as("n_docs"),
            round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6).as("psi"))
          .orderBy(col("source"))
      },
      Some(s"""WITH b AS (SELECT source,
                                 least(9, CAST(floor(
                                   len(list_filter(w, t -> t IN (${TextQueries.stopListSql}))) * 1.0
                                   / len(w) * 10) AS INTEGER)) AS bin
                          FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS w
                                FROM documents)
                          WHERE len(w) > 0),
               grid AS (SELECT DISTINCT source, r.range AS bin FROM b, range(0, 10) r),
               ps AS (SELECT source, bin, count(*) AS n_sb FROM b GROUP BY 1, 2),
               st AS (SELECT source, count(*) AS n_s FROM b GROUP BY 1),
               pb AS (SELECT bin, count(*) AS n_b FROM b GROUP BY 1),
               n AS (SELECT count(*) AS n FROM b)
               SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
                      round(sum((p - q) * ln(p / q)), 6) AS psi
               FROM (SELECT grid.source, st.n_s,
                            (coalesce(ps.n_sb, 0) + 1) * 1.0 / (st.n_s + 10) AS p,
                            (coalesce(pb.n_b, 0) + 1) * 1.0 / (n.n + 10) AS q
                     FROM grid
                     LEFT JOIN ps ON ps.source = grid.source AND ps.bin = grid.bin
                     JOIN st ON st.source = grid.source
                     LEFT JOIN pb ON pb.bin = grid.bin, n)
               GROUP BY source ORDER BY source""")),

    // ---- deterministic epoch shuffle (Sampling.epochShuffleKey): the
    // seeded permutation a training run reads the corpus in, as a pure
    // hash of (seed, doc_id) — reproducible across runs, engines and
    // partitionings, one independent order per seed, restartable without
    // a materialized permutation table. The registered head-of-epoch cut
    // is orderBy+limit (TakeOrderedAndProject — per-partition heads,
    // never a global sort); the full-epoch writer path is
    // repartitionByRange on the same key. Both seeds emitted so the
    // oracle pins that different epochs produce different orders.
    GraftQuery(
      "q120_epoch_shuffle",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"))
        def head(seed: Int) = docs
          .withColumn("shuffle_key", Sampling.epochShuffleKey(col("doc_id"), seed))
          .orderBy(col("shuffle_key"), col("doc_id"))
          .limit(20)
          .withColumn("seed", lit(seed))
        head(7).unionAll(head(8))
          .select(col("seed"), col("doc_id"), col("shuffle_key"))
          .orderBy(col("seed"), col("shuffle_key"), col("doc_id"))
      },
      Some(s"""WITH k AS (SELECT seed, doc_id,
                      ${p60("seed || ':' || CAST(doc_id AS VARCHAR)")} AS shuffle_key
                    FROM documents, (VALUES ('7'), ('8')) s(seed)),
               h AS (SELECT CAST(seed AS INTEGER) AS seed, doc_id, shuffle_key,
                            row_number() OVER (PARTITION BY seed
                              ORDER BY shuffle_key, doc_id) AS rn
                     FROM k)
               SELECT seed, doc_id, shuffle_key FROM h WHERE rn <= 20
               ORDER BY seed, shuffle_key, doc_id""")),

    // ---- the CCNet pipeline end to end (Wenzek et al. 2020 composed —
    // the flagship LLM training-data demonstration): bigram-LM scoring
    // (q133) → per-language head/middle/tail bucketing at the exact
    // quartile cuts (q146; at 100× the cuts frame swaps for q149's
    // approx_percentile twin — the bucketing plumbing downstream is
    // identical) → α=1/2 temperature mixing over (lang, bucket) token
    // mass (q132's exact-integer isqrt rates — the head of a dominant
    // language stops drowning every tail) → 256-token sequence packing
    // of the survivors (q89's two-level pack). Output is the packed
    // span frame: which docs survived and where their tokens landed —
    // so a drift ANYWHERE in the chain (a score, a cut, a rate, one
    // gate decision, the pack offsets) is a hash mismatch. The oracle
    // recomputes the entire chain independently (the q137 convention).
    GraftQuery(
      "q157_ccnet_pipeline",
      (s, d) => {
        val docs = t(s, d, "documents")
        val scored = TextPipeline.bigramLogProb(docs)
          .join(docs.select(col("doc_id").as("id"), col("lang"), col("text")), "id")
        val cuts = scored.groupBy(col("lang"))
          .agg(expr("percentile(avg_neg_logprob, array(0.25D, 0.75D))").as("c"))
          .select(col("lang"), col("c")(0).as("c1"), col("c")(1).as("c2"))
        val bucketed = scored.join(broadcast(cuts), "lang")
          .select(col("id").as("doc_id"), col("text"),
            concat_ws("/", col("lang"),
              when(col("avg_neg_logprob") <= col("c1"), "head")
                .when(col("avg_neg_logprob") <= col("c2"), "middle")
                .otherwise("tail")).as("mix_key"),
            size(Portable.tokens(col("text"))).cast("long").as("n_toks"))
        val rates = Sampling.sqrtTempRates(bucketed, col("mix_key"), col("n_toks"))
          .select(col("source"), col("rate_bp"))
        val mixed = bucketed
          .join(broadcast(rates), col("mix_key") === col("source"))
          .filter(Sampling.hashGate(col("doc_id"), col("rate_bp")))
        TextPipeline.pack(mixed, seqLen = 256, bucketWidth = 64)
          .orderBy(col("doc_id"), col("seq_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
               bi AS (SELECT doc_id, pr.a AS w1, pr.b AS w2
                      FROM (SELECT doc_id, unnest([{'a': w[i], 'b': w[i+1]} FOR i IN range(1, len(w))]) AS pr
                            FROM toks WHERE len(w) >= 2)),
               cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
               cu AS (SELECT w1, count(*) AS cu FROM bi GROUP BY 1),
               v AS (SELECT count(DISTINCT term) AS v FROM
                       (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents)
                     WHERE term <> ''),
               scored AS (SELECT doc_id,
                                 round(-avg(ln((cb + 1.0) / (cu + v))), 6) AS nll
                          FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
                          GROUP BY doc_id),
               sl AS (SELECT s.doc_id, s.nll, d.lang,
                             CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS n_toks
                      FROM scored s JOIN documents d USING (doc_id)),
               cuts AS (SELECT lang, quantile_cont(nll, 0.25) AS c1,
                               quantile_cont(nll, 0.75) AS c2
                        FROM sl GROUP BY 1),
               bk AS (SELECT doc_id, n_toks,
                             lang || '/' || CASE WHEN nll <= c1 THEN 'head'
                                                 WHEN nll <= c2 THEN 'middle'
                                                 ELSE 'tail' END AS mix_key
                      FROM sl JOIN cuts USING (lang)),
               st AS (SELECT mix_key,
                             CAST(floor(sqrt(CAST(sum(n_toks) AS DOUBLE))) AS BIGINT) AS isq
                      FROM bk GROUP BY 1
                      HAVING sum(n_toks) > 0),
               r AS (SELECT mix_key,
                            least(10000, (10000 * (SELECT min(isq) FROM st)) // isq) AS rate_bp
                     FROM st),
               k AS (SELECT bk.doc_id, bk.n_toks AS n
                     FROM bk JOIN r USING (mix_key)
                     WHERE ${p60("CAST(doc_id AS VARCHAR)")} % 10000 < rate_bp),
               o AS (SELECT doc_id, n,
                            CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                              AS BIGINT) AS off
                     FROM k WHERE n > 0),
               sp AS (SELECT doc_id, n, off,
                             unnest(range(off // 256, (off + n - 1) // 256 + 1)) AS seq_id
                      FROM o)
               SELECT doc_id, seq_id,
                      greatest(off, seq_id * 256) - seq_id * 256 AS pos,
                      least(off + n, (seq_id + 1) * 256) - greatest(off, seq_id * 256) AS n_tok
               FROM sp ORDER BY doc_id, seq_id""")),

    // ---- two-sample Kolmogorov–Smirnov drift statistic
    // (graft.ops.Drift — integer-exact sup-norm CDF distance; the
    // binning-free companion to q115's PSI): per language, does the
    // n_chars distribution of even-doc_id documents match the odd half?
    // The parity split is the deterministic null-hypothesis calibration
    // every drift monitor needs (against self-sampled halves the
    // statistic should be small; against a re-crawl it's the alarm).
    // All CDF arithmetic stays in longs — |cumA·nB − cumB·nA| maxed
    // exactly, ONE final division, 6dp — so the hash can't be moved by
    // float accumulation order on either engine.
    GraftQuery(
      "q191_ks_drift",
      (s, d) => graft.ops.Drift.ksStatistic(
          t(s, d, "documents"),
          col("lang"), col("n_chars"), pmod(col("doc_id"), lit(2)) === 1)
        .select(col("g").as("lang"), col("na"), col("nb"), col("ks"))
        .orderBy(col("lang")),
      Some("""WITH t AS (SELECT lang AS g, n_chars AS x,
                                CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS b
                         FROM documents),
              per AS (SELECT g, x, CAST(sum(1 - b) AS BIGINT) AS ca,
                             CAST(sum(b) AS BIGINT) AS cb
                      FROM t GROUP BY 1, 2),
              cum AS (SELECT g, x, ca, cb,
                             sum(ca) OVER pw AS cuma, sum(cb) OVER pw AS cumb
                      FROM per
                      WINDOW pw AS (PARTITION BY g ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              tot AS (SELECT g, sum(ca) AS na, sum(cb) AS nb FROM per GROUP BY 1)
              SELECT g AS lang, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                     round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
                           / (na * nb), 6) AS ks
              FROM cum JOIN tot USING (g)
              WHERE na > 0 AND nb > 0
              GROUP BY g, na, nb ORDER BY lang""")),

    // ---- two-sample Wasserstein-1 drift (Drift.w1Statistic — the L1
    // companion to q191's KS sup-norm, both derived views of the SAME
    // per-(group, value) counts): per language, how much total mass
    // displacement separates the even/odd n_chars halves. KS answers
    // "is there a gap anywhere"; W1 answers "how far did the
    // distribution move" — a uniform +1 shift of every value moves W1
    // by exactly 1 while KS stays small, so a production monitor gates
    // on both. Integer-exact like q191: Σ |cumA·nB − cumB·nA|·gap in
    // longs, one final division, 6dp.
    GraftQuery(
      "q207_w1_drift",
      (s, d) => graft.ops.Drift.w1Statistic(
          t(s, d, "documents"),
          col("lang"), col("n_chars"), pmod(col("doc_id"), lit(2)) === 1)
        .select(col("g").as("lang"), col("na"), col("nb"), col("w1"))
        .orderBy(col("lang")),
      Some("""WITH t AS (SELECT lang AS g, n_chars AS x,
                                CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS b
                         FROM documents),
              per AS (SELECT g, x, CAST(sum(1 - b) AS BIGINT) AS ca,
                             CAST(sum(b) AS BIGINT) AS cb
                      FROM t GROUP BY 1, 2),
              cum AS (SELECT g, x, ca, cb,
                             sum(ca) OVER pw AS cuma, sum(cb) OVER pw AS cumb,
                             lead(x) OVER (PARTITION BY g ORDER BY x) - x AS gap
                      FROM per
                      WINDOW pw AS (PARTITION BY g ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              tot AS (SELECT g, sum(ca) AS na, sum(cb) AS nb FROM per GROUP BY 1)
              SELECT g AS lang, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                     round(CAST(sum(CASE WHEN gap IS NOT NULL
                                    THEN abs(cuma * nb - cumb * na) * gap
                                    ELSE 0 END) AS DOUBLE) / (na * nb), 6) AS w1
              FROM cum JOIN tot USING (g)
              WHERE na > 0 AND nb > 0
              GROUP BY g, na, nb ORDER BY lang""")),

    // ---- two-sample chi-squared homogeneity drift
    // (Drift.chi2Statistic — the CATEGORICAL face of the drift-monitor
    // trio, all three derived views of one per-(group, value) counts
    // state): per language, did the SOURCE mix of the even doc_id half
    // match the odd half? source is nominal — KS/W1 presuppose a value
    // ordering that means nothing here; χ² weighs each bin's rate
    // mismatch with thin bins amplified, which is exactly the "one
    // crawler's share collapsed" alarm. Per-bin numerators exact in
    // longs (squared exactly in double at these n), exact long
    // denominators, one per-group sum, 6dp.
    GraftQuery(
      "q208_chi2_drift",
      (s, d) => graft.ops.Drift.chi2Statistic(
          t(s, d, "documents"),
          col("lang"), col("source"), pmod(col("doc_id"), lit(2)) === 1)
        .select(col("g").as("lang"), col("na"), col("nb"),
          col("bins"), col("dof"), col("chi2"))
        .orderBy(col("lang")),
      Some("""WITH t AS (SELECT lang AS g, source AS x,
                                CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS b
                         FROM documents),
              per AS (SELECT g, x, CAST(sum(1 - b) AS BIGINT) AS ca,
                             CAST(sum(b) AS BIGINT) AS cb
                      FROM t GROUP BY 1, 2),
              tot AS (SELECT g, sum(ca) AS na, sum(cb) AS nb FROM per GROUP BY 1)
              SELECT g AS lang, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                     CAST(count(*) AS BIGINT) AS bins,
                     CAST(count(*) - 1 AS BIGINT) AS dof,
                     round(sum(CAST(ca * nb - cb * na AS DOUBLE)
                               * CAST(ca * nb - cb * na AS DOUBLE)
                               / (na * nb * (ca + cb))), 6) AS chi2
              FROM per JOIN tot USING (g)
              WHERE na > 0 AND nb > 0 AND ca + cb > 0
              GROUP BY g, na, nb ORDER BY lang""")),

    // ---- equi-depth quantile binning (ops.Binning.equiDepth — the
    // feature discretizer): per language, n_chars into 4 buckets of
    // near-equal row count via ntile over the TOTAL order (n_chars,
    // doc_id). ntile is pure rank arithmetic — bucket sizes differ by
    // at most one, both engines agree bit-for-bit given the same
    // order — so the row-level assignment is fully hash-checkable.
    // The 100 TB face is Binning.equiDepthApprox (sketch boundaries +
    // scan-side search, no per-group sort), spec-pinned against this
    // exact face within sketch tolerance.
    GraftQuery(
      "q209_quantile_binning",
      (s, d) => graft.ops.Binning.equiDepth(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          col("lang"), Seq(col("n_chars"), col("doc_id")), k = 4)
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang, n_chars,
                     CAST(ntile(4) OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS INT) AS bucket
              FROM documents ORDER BY doc_id""")),

    // ---- seasonal-baseline volume anomaly: per (event_type,
    // hour-of-day) the history of hourly event counts defines a
    // baseline mean/stddev, and any hour whose count leaves the ±2σ
    // band is flagged with its z-score — the "did Tuesday 3am traffic
    // spike" monitor that a global threshold gets wrong the moment
    // volume has a daily shape. Determinism without sacrificing the
    // gate: mu and sigma are 6dp-ROUNDED BEFORE the comparison on both
    // engines, so the band edges are bit-identical doubles and the
    // flagged set cannot be moved by stddev accumulation-order jitter
    // (cnt is an exact long; |cnt − mu| and 2·sigma are then exact
    // dyadic ops on identical inputs). Scale shape: one hourly
    // pre-aggregation (map-side combined), a |types|·24-row baseline
    // broadcast back, scan-side flagging — nothing corpus-wide
    // shuffles twice. Groups seen only once (sigma undefined) are
    // excluded honestly rather than flagged on no evidence.
    GraftQuery(
      "q210_seasonal_anomaly",
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val base = hourly.withColumn("hod", hour(col("hr")))
          .groupBy(col("event_type"), col("hod"))
          .agg(round(avg(col("cnt")), 6).as("mu"),
            round(stddev_samp(col("cnt")), 6).as("sigma"),
            count(lit(1)).as("n_obs"))
        hourly.withColumn("hod", hour(col("hr")))
          .join(broadcast(base), Seq("event_type", "hod"))
          .filter(col("sigma").isNotNull &&
            abs(col("cnt") - col("mu")) > lit(2.0) * col("sigma"))
          .select(col("event_type"),
            date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr_s"),
            col("cnt"), col("mu"), col("sigma"),
            round((col("cnt") - col("mu")) / col("sigma"), 4).as("z"),
            col("n_obs"))
          .orderBy(col("event_type"), col("hr_s"))
      },
      Some("""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                                     CAST(count(*) AS BIGINT) AS cnt
                              FROM events GROUP BY 1, 2),
              base AS (SELECT event_type, extract(hour FROM hr) AS hod,
                              round(avg(cnt), 6) AS mu,
                              round(stddev_samp(cnt), 6) AS sigma,
                              CAST(count(*) AS BIGINT) AS n_obs
                       FROM hourly GROUP BY 1, 2)
              SELECT h.event_type, strftime(h.hr, '%Y-%m-%d %H:%M:%S') AS hr_s,
                     h.cnt, b.mu, b.sigma,
                     round((h.cnt - b.mu) / b.sigma, 4) AS z, b.n_obs
              FROM hourly h JOIN base b
                ON h.event_type = b.event_type
               AND extract(hour FROM h.hr) = b.hod
              WHERE b.sigma IS NOT NULL AND abs(h.cnt - b.mu) > 2 * b.sigma
              ORDER BY h.event_type, hr_s""")),

    // ---- distribution entropy / evenness profile
    // (Drift.entropyFromCounts — the single-sample profiling face over
    // the same value-counts statistic the drift monitors read): per
    // language, the Shannon entropy and evenness of the SOURCE mix.
    // Evenness near 0 is the "one crawler took over" tripwire, near 1
    // a healthy mix; tracked across snapshots it is the cheapest
    // diversity-collapse alarm. Every log argument is an exact
    // integer-valued double (Σ c·ln c, division after), so cross-engine
    // exposure is 1-ulp libm jitter under the 6dp round.
    GraftQuery(
      "q211_entropy_profile",
      (s, d) => graft.ops.Drift.entropyFromCounts(
          graft.ops.Drift.valueCounts(
            t(s, d, "documents"), col("lang"), col("source")))
        .select(col("g").as("lang"), col("n"), col("bins"),
          col("entropy"), col("evenness"))
        .orderBy(col("lang")),
      Some("""WITH per AS (SELECT lang AS g, source AS x,
                                  CAST(count(*) AS BIGINT) AS c
                           FROM documents GROUP BY 1, 2),
              agg AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
                             CAST(count(*) AS BIGINT) AS bins,
                             sum(c * ln(CAST(c AS DOUBLE))) AS clc
                      FROM per GROUP BY 1)
              SELECT g AS lang, n, bins,
                     round(ln(CAST(n AS DOUBLE)) - clc / n, 6) AS entropy,
                     CASE WHEN bins > 1
                          THEN round((ln(CAST(n AS DOUBLE)) - clc / n)
                                     / ln(CAST(bins AS DOUBLE)), 6) END AS evenness
              FROM agg ORDER BY lang""")),

    // ---- mutual information between event type and hour-of-day —
    // q211's entropy extended to the TWO-variable question every
    // feature audit asks ("does this categorical actually carry
    // signal about that one"): MI = Σ_ij (n_ij/N)·ln(N·n_ij/(n_i·n_j))
    // plus both marginal entropies and the normalized MI/min(H). All
    // log arguments are ratios of EXACT LONGS (N·n_ij stays under
    // 2^63 to ~3·10⁹ rows/cell); unlike q211's few-term same-sign sum,
    // MI terms CANCEL (log-ratios straddle 0), so the cell sum runs as
    // a DEFINED-ORDER head-seeded fold over the (type, hour)-sorted
    // term list — q198's convention, immune to accumulation order —
    // and the two marginal sums follow suit. Scale: one partial-
    // aggregating pass to |types|·24 cells; folds and margins are
    // broadcast-tiny.
    GraftQuery(
      "q282_mutual_information",
      (s, d) => {
        val cells = t(s, d, "events")
          .groupBy(col("event_type").as("a"), hour(col("ts")).as("h"))
          .agg(count(lit(1)).as("nij"))
          .localCheckpoint(true) // |types|·24 rows; margins + terms below
        val ma = cells.groupBy(col("a")).agg(sum(col("nij")).as("ni"))
        val mb = cells.groupBy(col("h")).agg(sum(col("nij")).as("nj"))
        val nn = cells.agg(sum(col("nij")).as("nt"),
          count(lit(1)).as("n_cells"))
        def foldSum(c: Column): Column = {
          val xs = transform(array_sort(c), s => s.getField("term"))
          aggregate(slice(xs, lit(2), size(xs) - 1), element_at(xs, 1),
            (acc, x) => acc + x)
        }
        val mi = cells.join(broadcast(ma), "a").join(broadcast(mb), "h")
          .crossJoin(broadcast(nn))
          .select(struct(col("a"), col("h"),
            (col("nij").cast("double") *
              log((col("nt") * col("nij")).cast("double") /
                (col("ni") * col("nj")).cast("double"))).as("term")).as("c"))
          .agg(foldSum(collect_list(col("c"))).as("smi"))
        def hFold(m: DataFrame, key: String, cnt: String): DataFrame =
          m.select(struct(col(key),
              (col(cnt).cast("double") * log(col(cnt).cast("double")))
                .as("term")).as("c"))
            .agg(foldSum(collect_list(col("c"))).as(s"s_$key"))
        mi.crossJoin(broadcast(hFold(ma, "a", "ni")))
          .crossJoin(broadcast(hFold(mb, "h", "nj")))
          .crossJoin(broadcast(nn))
          .select(col("nt").as("n"), col("n_cells"),
            round(col("smi") / col("nt").cast("double"), 6).as("mi_nats"),
            round(log(col("nt").cast("double")) -
              col("s_a") / col("nt").cast("double"), 6).as("h_type"),
            round(log(col("nt").cast("double")) -
              col("s_h") / col("nt").cast("double"), 6).as("h_hour"),
            round((col("smi") / col("nt").cast("double")) /
              least(
                log(col("nt").cast("double")) - col("s_a") / col("nt").cast("double"),
                log(col("nt").cast("double")) - col("s_h") / col("nt").cast("double")),
              6).as("nmi"))
      },
      Some("""WITH cells AS (SELECT event_type AS a, extract(hour FROM ts) AS h,
                                    CAST(count(*) AS BIGINT) AS nij
                             FROM events GROUP BY 1, 2),
              ma AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
              mb AS (SELECT h, CAST(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY 1),
              nn AS (SELECT CAST(sum(nij) AS BIGINT) AS nt,
                            CAST(count(*) AS BIGINT) AS n_cells FROM cells),
              tm AS (SELECT list(CAST(nij AS DOUBLE)
                               * ln(CAST(nt * nij AS DOUBLE)
                                    / CAST(ni * nj AS DOUBLE))
                               ORDER BY a, h) AS xs
                     FROM cells JOIN ma USING (a) JOIN mb USING (h) CROSS JOIN nn),
              smi AS (SELECT list_reduce(xs, (acc, x) -> acc + x) AS smi FROM tm),
              ha AS (SELECT list_reduce(list(CAST(ni AS DOUBLE)
                              * ln(CAST(ni AS DOUBLE)) ORDER BY a),
                            (acc, x) -> acc + x) AS s_a FROM ma),
              hb AS (SELECT list_reduce(list(CAST(nj AS DOUBLE)
                              * ln(CAST(nj AS DOUBLE)) ORDER BY h),
                            (acc, x) -> acc + x) AS s_h FROM mb)
              SELECT nt AS n, n_cells,
                     round(smi / CAST(nt AS DOUBLE), 6) AS mi_nats,
                     round(ln(CAST(nt AS DOUBLE)) - s_a / CAST(nt AS DOUBLE), 6)
                       AS h_type,
                     round(ln(CAST(nt AS DOUBLE)) - s_h / CAST(nt AS DOUBLE), 6)
                       AS h_hour,
                     round((smi / CAST(nt AS DOUBLE)) /
                       least(ln(CAST(nt AS DOUBLE)) - s_a / CAST(nt AS DOUBLE),
                             ln(CAST(nt AS DOUBLE)) - s_h / CAST(nt AS DOUBLE)), 6)
                       AS nmi
              FROM nn CROSS JOIN smi CROSS JOIN ha CROSS JOIN hb""")),

    // ---- exact WEIGHTED median — the robust center when rows carry
    // integer mass (line items weighted by quantity here; docs by
    // token count in a corpus): the lower weighted median is the first
    // value whose CUMULATIVE weight crosses half the total, so the
    // whole selection is integer comparisons over a total order —
    // cw·2 ≥ tw picks the crossing, (cw − w)·2 < tw pins it uniquely
    // (weights ≥ 1 make cum strictly increasing) — no float arithmetic
    // anywhere near the decision, bit-stable on any engine. Complements
    // q155's unweighted percentile MAD. Scale: one window over the
    // group order + a |groups|-row total join; the 100 TB swap is a
    // weighted quantile sketch, same plumbing as q142.
    GraftQuery(
      "q212_weighted_median",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, d, "lineitem").select(
          col("l_returnflag").as("flag"), col("l_extendedprice").as("price"),
          col("l_quantity").cast("long").as("w"),
          col("l_orderkey"), col("l_linenumber"))
        val win = Window.partitionBy(col("flag"))
          .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
        val cum = li.withColumn("cw", sum(col("w")).over(win))
        val tot = li.groupBy(col("flag"))
          .agg(sum(col("w")).as("tw"), count(lit(1)).as("n_rows"))
        cum.join(tot, "flag")
          .filter(col("cw") * 2 >= col("tw") &&
            (col("cw") - col("w")) * 2 < col("tw"))
          .select(col("flag"), col("tw"), col("n_rows"),
            col("price").as("wmedian"))
          .orderBy(col("flag"))
      },
      Some("""WITH li AS (SELECT l_returnflag AS flag, l_extendedprice AS price,
                                 CAST(l_quantity AS BIGINT) AS w,
                                 l_orderkey, l_linenumber
                          FROM lineitem),
              cum AS (SELECT flag, price, w,
                             sum(w) OVER (PARTITION BY flag
                               ORDER BY price, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cw
                      FROM li),
              tot AS (SELECT flag, CAST(sum(w) AS BIGINT) AS tw,
                             CAST(count(*) AS BIGINT) AS n_rows
                      FROM li GROUP BY 1)
              SELECT flag, tw, n_rows, price AS wmedian
              FROM cum JOIN tot USING (flag)
              WHERE cw * 2 >= tw AND (cw - w) * 2 < tw
              ORDER BY flag""")),

    // ---- q212's 100 TB face, delivering its scaladoc's promised swap
    // (ops.WeightedQuantile — mergeable binned weighted-CDF sketch):
    // per-flag fixed-width bins over [min, max] (two broadcast scalars),
    // per-(flag, bin) WEIGHT sums — the Drift.valueCounts mergeable
    // shape with weight as the count — then the q212 integer crossing
    // rule lifted from rows to bins, so the window runs over ≤128 bins
    // per group instead of every row. The true weighted median provably
    // lies inside the reported [bin_lo, bin_hi) band (OpsSpec pins the
    // q212 exact median inside it); bin arithmetic is correctly-rounded
    // IEEE ops on identical inputs — bit-identical cross-engine, no
    // rounding anywhere, fully hash-checkable. q212 stays registered as
    // the exact audit twin.
    GraftQuery(
      "q231_wmedian_sketch",
      (s, d) => graft.ops.WeightedQuantile.quantileBinned(
          t(s, d, "lineitem"), col("l_returnflag"),
          col("l_extendedprice"), col("l_quantity"),
          bins = 128, pBp = 5000)
        .select(col("g").as("flag"), col("tw"), col("n_bins_hit"),
          col("bin"), col("bin_lo"), col("bin_hi"), col("bin_w"))
        .orderBy(col("flag")),
      Some("""WITH r0 AS (SELECT l_returnflag AS g,
                                 CAST(l_extendedprice AS DOUBLE) AS v,
                                 CAST(l_quantity AS BIGINT) AS w
                          FROM lineitem WHERE l_extendedprice IS NOT NULL),
              b AS (SELECT g, min(v) AS lo, max(v) AS hi FROM r0 GROUP BY 1),
              binned AS (SELECT r.g, r.w,
                                CASE WHEN b.hi = b.lo THEN 0
                                     ELSE LEAST(127, CAST(floor((r.v - b.lo)
                                       * 128 / (b.hi - b.lo)) AS INTEGER)) END AS bin
                         FROM r0 r JOIN b USING (g)),
              cnts AS (SELECT g, bin, CAST(sum(w) AS BIGINT) AS bw
                       FROM binned GROUP BY 1, 2),
              tot AS (SELECT g, CAST(sum(bw) AS BIGINT) AS tw,
                             CAST(count(*) AS BIGINT) AS n_bins_hit
                      FROM cnts GROUP BY 1),
              cum AS (SELECT g, bin, bw,
                             sum(bw) OVER (PARTITION BY g ORDER BY bin) AS cw
                      FROM cnts)
              SELECT c.g AS flag, t.tw, t.n_bins_hit, c.bin,
                     b.lo + c.bin * (b.hi - b.lo) / 128 AS bin_lo,
                     b.lo + (c.bin + 1) * (b.hi - b.lo) / 128 AS bin_hi,
                     c.bw AS bin_w
              FROM cum c JOIN tot t USING (g) JOIN b USING (g)
              WHERE c.cw * 10000 >= t.tw * 5000
                AND (c.cw - c.bw) * 10000 < t.tw * 5000
              ORDER BY flag""")),

    // ---- Pareto concentration: per event type, how many users
    // produce 80% of the events — the "is this traffic a few whales or
    // a broad base" diagnostic that decides whether per-key salting
    // (q195/q126) is even on the table. k80 = size of the smallest
    // (count DESC, user_id) prefix whose cumulative share reaches 80%,
    // decided entirely in integers (a user is needed iff 5·cum-before
    // < 4·total), so the cut is engine-exact; only the reported share
    // ratio is a rounded division of identical integers. Scale: the
    // rank window partitions per type over the |users|-sized count
    // frame, not the raw events.
    GraftQuery(
      "q213_pareto_concentration",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val uc = t(s, d, "events").filter(col("user_id").isNotNull)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        val win = Window.partitionBy(col("event_type"))
          .orderBy(col("c").desc, col("user_id"))
        val cum = uc.withColumn("cum", sum(col("c")).over(win))
        val tot = uc.groupBy(col("event_type"))
          .agg(sum(col("c")).as("total_events"), count(lit(1)).as("n_users"))
        cum.join(tot, "event_type")
          .filter((col("cum") - col("c")) * 5 < col("total_events") * 4)
          .groupBy(col("event_type"))
          .agg(first(col("n_users")).as("n_users"),
            first(col("total_events")).as("total_events"),
            count(lit(1)).as("k80"))
          .select(col("event_type"), col("n_users"), col("total_events"),
            col("k80"),
            round(col("k80").cast("double") / col("n_users"), 4)
              .as("k80_share"))
          .orderBy(col("event_type"))
      },
      Some("""WITH uc AS (SELECT event_type, user_id,
                                 CAST(count(*) AS BIGINT) AS c
                          FROM events WHERE user_id IS NOT NULL
                          GROUP BY 1, 2),
              cum AS (SELECT event_type, user_id, c,
                             sum(c) OVER (PARTITION BY event_type
                               ORDER BY c DESC, user_id
                               ROWS UNBOUNDED PRECEDING) AS cum
                      FROM uc),
              tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS total_events,
                             CAST(count(*) AS BIGINT) AS n_users
                      FROM uc GROUP BY 1)
              SELECT event_type, n_users, total_events,
                     CAST(count(*) AS BIGINT) AS k80,
                     round(CAST(count(*) AS DOUBLE) / n_users, 4) AS k80_share
              FROM cum JOIN tot USING (event_type)
              WHERE (cum - c) * 5 < total_events * 4
              GROUP BY event_type, n_users, total_events
              ORDER BY event_type""")),

    // ---- inter-labeler agreement (Cohen's kappa) — the label-quality
    // gate for any labeling/annotation stage: two independent binary
    // labelers over the same documents (here two deterministic quality
    // heuristics: size ≥ 300 chars vs word count ≥ 50), per-language
    // confusion matrix, kappa = (p_o − p_e)/(1 − p_e). High agreement
    // on raw accuracy alone is vacuous when one class dominates —
    // kappa subtracts the chance-agreement floor, which is why
    // annotation pipelines gate on it and not on p_o. All confusion
    // cells are exact integers; p_o/p_e are rationals over identical
    // integers on both engines — one 6dp round at the end. Scale: one
    // scan folds to the 4-cell matrix per group.
    GraftQuery(
      "q217_label_agreement",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("lang"),
            (col("n_chars") >= 300).as("a"),
            (size(split(col("text"), " ")) >= 50).as("b"))
        docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
            sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
            sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
            sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
          .withColumn("po", (col("n11") + col("n00")).cast("double") / col("n"))
          .withColumn("pe",
            ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
             (col("n01") + col("n00")) * (col("n10") + col("n00")))
              .cast("double") / (col("n") * col("n")))
          // degenerate group (both labelers constant -> p_e = 1): kappa
          // is undefined; emit NULL on both engines rather than letting
          // Spark's null-on-/0 meet DuckDB's NaN
          .select(col("lang"), col("n"), col("n11"), col("n10"),
            col("n01"), col("n00"),
            round(when(col("pe") < 1.0,
              (col("po") - col("pe")) / (lit(1.0) - col("pe"))), 6).as("kappa"))
          .orderBy(col("lang"))
      },
      Some("""WITH l AS (SELECT lang,
                                (n_chars >= 300) AS a,
                                (len(string_split(text, ' ')) >= 50) AS b
                         FROM documents),
              m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                           CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                           CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                           CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
                    FROM l GROUP BY 1)
              ,
              p AS (SELECT lang, n, n11, n10, n01, n00,
                           CAST(n11 + n00 AS DOUBLE) / n AS po,
                           CAST((n11 + n10) * (n11 + n01)
                                + (n01 + n00) * (n10 + n00) AS DOUBLE)
                             / (n * n) AS pe
                    FROM m)
              SELECT lang, n, n11, n10, n01, n00,
                     round(CASE WHEN pe < 1
                           THEN (po - pe) / (1 - pe) END, 6) AS kappa
              FROM p ORDER BY lang""")),

    // ---- Gini concentration index — q213's Pareto cut asks "how many
    // whales"; the Gini asks "how unequal overall", one number in
    // [0, 1) that trend-lines cleanly across snapshots. Computed from
    // the ascending-sorted per-user event counts with the rank
    // formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n, whose numerators are
    // EXACT integers (i·xᵢ summed in longs) — the only float is the
    // final two-term expression over identical integers, 6dp-rounded.
    // Scale: the rank window runs over the |users|-sized count frame
    // per type, not raw events (same bound as q213).
    GraftQuery(
      "q218_gini_concentration",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val uc = t(s, d, "events").filter(col("user_id").isNotNull)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        val win = Window.partitionBy(col("event_type"))
          .orderBy(col("c"), col("user_id"))
        uc.withColumn("i", row_number().over(win))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("c")).as("total_events"),
            sum(col("i") * col("c")).as("ix"))
          .select(col("event_type"), col("n_users"), col("total_events"),
            round(
              lit(2.0) * col("ix") / (col("n_users") * col("total_events")) -
                (col("n_users") + 1).cast("double") / col("n_users"), 6)
              .as("gini"))
          .orderBy(col("event_type"))
      },
      Some("""WITH uc AS (SELECT event_type, user_id,
                                 CAST(count(*) AS BIGINT) AS c
                          FROM events WHERE user_id IS NOT NULL
                          GROUP BY 1, 2),
              r AS (SELECT event_type, c,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY c, user_id) AS i
                    FROM uc),
              a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                           CAST(sum(c) AS BIGINT) AS total_events,
                           CAST(sum(i * c) AS BIGINT) AS ix
                    FROM r GROUP BY 1)
              SELECT event_type, n_users, total_events,
                     round(CAST(2.0 AS DOUBLE) * ix / (n_users * total_events)
                           - CAST(n_users + 1 AS DOUBLE) / n_users, 6) AS gini
              FROM a ORDER BY event_type""")),

    // ---- cohort retention matrix — the product-analytics staple:
    // users grouped by FIRST-SEEN date, and for day offsets 0..6 the
    // count and rate still active that day. Everything is exact set
    // arithmetic (distinct (user, day) memberships, integer datediffs,
    // one rounded rate division), so the matrix hashes bit-for-bit.
    // Scale: the active frame is |users|·|days|-distinct (already
    // collapsed from raw events by the distinct), the cohort frame
    // |users|-sized; the join is user-keyed — co-partitioned at scale.
    GraftQuery(
      "q219_retention_cohorts",
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        val sizes = first.groupBy(col("cohort"))
          .agg(count(lit(1)).as("cohort_size"))
        ev.distinct()
          .join(first, "user_id")
          .withColumn("day_offset", datediff(col("day"), col("cohort")))
          .filter(col("day_offset").between(0, 6))
          .groupBy(col("cohort"), col("day_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort")
          .select(col("cohort").cast("string").as("cohort_day"),
            col("day_offset"), col("n_active"), col("cohort_size"),
            round(col("n_active").cast("double") / col("cohort_size"), 6)
              .as("retention"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                          FROM events WHERE user_id IS NOT NULL),
              first AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1),
              sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
                        FROM first GROUP BY 1),
              act AS (SELECT f.cohort, date_diff('day', f.cohort, e.day) AS day_offset,
                             CAST(count(*) AS BIGINT) AS n_active
                      FROM ev e JOIN first f USING (user_id)
                      WHERE date_diff('day', f.cohort, e.day) BETWEEN 0 AND 6
                      GROUP BY 1, 2)
              SELECT CAST(a.cohort AS VARCHAR) AS cohort_day, a.day_offset,
                     a.n_active, s.cohort_size,
                     round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6)
                       AS retention
              FROM act a JOIN sizes s USING (cohort)
              ORDER BY cohort_day, day_offset""")),

    // ---- funnel step conversion — the drop-off table behind
    // sessionFunnels' boolean: of the users with any event, how many
    // reach view, then a click AT OR AFTER their first view, then a
    // purchase at or after that click — the chain uses set-based
    // EARLIEST timestamps (the q166 rule), so the verdict is
    // independent of event arrival order, and every count is an exact
    // distinct-user integer. One row out with stepwise and absolute
    // conversion rates. Scale: three user-keyed min-aggregates chained
    // by broadcastable |users|-sized frames.
    GraftQuery(
      "q220_funnel_steps",
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id").isNotNull)
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("ts") >= col("v_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("ts") >= col("c_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        // one distributed plan, one output row — four 1-row aggregates
        // cross-joined (each broadcast), no driver-side counting
        ev.agg(countDistinct(col("user_id")).as("n_users"))
          .crossJoin(v.agg(count(lit(1)).as("n_view")))
          .crossJoin(c.agg(count(lit(1)).as("n_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
          .select(col("n_users"), col("n_view"), col("n_click"),
            col("n_purchase"),
            round(col("n_view").cast("double") / col("n_users"), 6)
              .as("r_view"),
            round(col("n_click").cast("double") / col("n_view"), 6)
              .as("r_click_given_view"),
            round(col("n_purchase").cast("double") / col("n_click"), 6)
              .as("r_purchase_given_click"),
            round(col("n_purchase").cast("double") / col("n_users"), 6)
              .as("r_purchase_overall"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, ts FROM events
                          WHERE user_id IS NOT NULL),
              v AS (SELECT user_id, min(ts) AS v_ts FROM ev
                    WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, min(e.ts) AS c_ts
                    FROM ev e JOIN v USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts >= v.v_ts
                    GROUP BY 1),
              p AS (SELECT e.user_id, min(e.ts) AS p_ts
                    FROM ev e JOIN c USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
                    GROUP BY 1)
              SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev) AS n_users,
                     (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
                     (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
                     (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase,
                     round(CAST((SELECT count(*) FROM v) AS DOUBLE)
                           / (SELECT count(DISTINCT user_id) FROM ev), 6) AS r_view,
                     round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                           / (SELECT count(*) FROM v), 6) AS r_click_given_view,
                     round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                           / (SELECT count(*) FROM c), 6) AS r_purchase_given_click,
                     round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                           / (SELECT count(DISTINCT user_id) FROM ev), 6)
                       AS r_purchase_overall""")),

    // ---- day-over-day trending items: per day, items ranked by
    // engagement count (count DESC, item — total order); consecutive
    // days joined on item; the movers report carries both ranks, the
    // rank climb, and the count delta. Everything is integer rank
    // arithmetic — no rates, no floats — so the report hashes exactly.
    // The day-pair join is item-keyed over |items|-sized daily frames
    // (never raw events), and "consecutive" is a calendar self-join on
    // day+1, not a window over the whole history.
    GraftQuery(
      "q225_trending_items",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, d, "events")
          .filter(Tables.propsItem.isNotNull)
          .select(to_date(col("ts")).as("day"), Tables.propsItem.as("item"))
          .groupBy(col("day"), col("item")).agg(count(lit(1)).as("c"))
        val ranked = daily.withColumn("rnk",
          row_number().over(Window.partitionBy(col("day"))
            .orderBy(col("c").desc, col("item"))))
        val prev = ranked.select(col("day").as("pday"), col("item").as("item_p"),
          col("c").as("c_prev"), col("rnk").as("rnk_prev"))
        ranked.join(prev,
            ranked("item") === prev("item_p") &&
              ranked("day") === date_add(col("pday"), 1))
          .select(ranked("day").cast("string").as("day"), ranked("item"),
            col("c_prev"), ranked("c").as("c_now"),
            col("rnk_prev"), ranked("rnk").as("rnk_now"),
            (col("rnk_prev") - ranked("rnk")).as("rank_climb"),
            (ranked("c") - col("c_prev")).as("count_delta"))
          .filter(col("rank_climb") > 0)
          .orderBy(col("day"), col("rank_climb").desc, col("item"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                                    CAST(props->>'k' AS INTEGER) AS item,
                                    CAST(count(*) AS BIGINT) AS c
                             FROM events WHERE (props->>'k') IS NOT NULL
                             GROUP BY 1, 2),
              ranked AS (SELECT day, item, c,
                                row_number() OVER (PARTITION BY day
                                  ORDER BY c DESC, item) AS rnk
                         FROM daily)
              SELECT CAST(a.day AS VARCHAR) AS day, a.item,
                     b.c AS c_prev, a.c AS c_now,
                     b.rnk AS rnk_prev, a.rnk AS rnk_now,
                     CAST(b.rnk - a.rnk AS BIGINT) AS rank_climb,
                     CAST(a.c - b.c AS BIGINT) AS count_delta
              FROM ranked a JOIN ranked b
                ON a.item = b.item AND a.day = b.day + INTERVAL 1 DAY
              WHERE b.rnk - a.rnk > 0
              ORDER BY day, rank_climb DESC, a.item""")),

    // ---- per-group z-score standardization — the feature-scaling
    // transform every tabular model stage wants, emitted row-level:
    // z = (x − μ)/σ with μ and σ 6dp-ROUNDED BEFORE the division (the
    // q210 determinism discipline: identical band inputs on both
    // engines, so the only jitter left is the one rounded output).
    // Groups with σ = 0 or a single row emit null z (no spread to
    // scale by), not ±Inf. Scale: one |groups|-row moment frame
    // broadcast back over the fact — the encoder-frame shape q197/q206
    // established.
    GraftQuery(
      "q226_standardize",
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id").isNotNull)
        val stats = ev.groupBy(col("event_type"))
          .agg(round(avg(col("value")), 6).as("mu"),
            round(stddev_samp(col("value")), 6).as("sigma"))
        ev.join(broadcast(stats), "event_type")
          .select(col("event_type"), col("event_id"), col("value"),
            round(when(col("sigma") > 0,
              (col("value") - col("mu")) / col("sigma")), 6).as("z"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""WITH st AS (SELECT event_type, round(avg(value), 6) AS mu,
                                 round(stddev_samp(value), 6) AS sigma
                          FROM events WHERE user_id IS NOT NULL GROUP BY 1)
              SELECT event_type, event_id, value,
                     round(CASE WHEN sigma > 0
                           THEN (value - mu) / sigma END, 6) AS z
              FROM events JOIN st USING (event_type)
              WHERE user_id IS NOT NULL
              ORDER BY event_type, event_id""")),

    // ---- exact-COUNT stratified sampling: "give me exactly 200 docs,
    // proportional by language" — the budgeted complement of the
    // rate-based q60 (rates can't hit an exact global count). The
    // budget splits across strata by largest-remainder proration
    // (graft.ops.Prorate — whole docs, sums exactly to min(budget,
    // corpus)), and each stratum takes its k_i lowest-p60-hash members
    // (hash order, not id order, so the pick is an unbiased
    // deterministic sample and STABLE under reordering/partitioning —
    // the q60 gate convention, rank-based instead of rate-based). A
    // stratum allocated more than its size just takes everything
    // (budget > corpus degrades to "all", documented not hidden).
    // Scale: one |strata|-row allocation frame broadcast back, one
    // per-stratum rank window — the same per-key bound as q66's cap.
    GraftQuery(
      "q193_stratified_budget",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
        val strata = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .select(lit(1L).as("grp"), col("lang"), col("n"), lit(200L).as("budget"))
        val alloc = graft.ops.Prorate.largestRemainder(strata,
            col("grp"), col("lang"), col("n"), col("budget"))
          .select(col("id").as("lang"), col("alloc"))
        val ranked = docs.select(col("doc_id"), col("lang"),
            graft.ops.Portable.p60(col("doc_id").cast("string")).as("h"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
        ranked.join(broadcast(alloc), "lang")
          .filter(col("rn") <= col("alloc"))
          .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH strata AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                               FROM documents GROUP BY 1),
               w AS (SELECT sum(n) AS bigw FROM strata),
               calc AS (SELECT lang, n,
                               (200 * n) // bigw AS base,
                               (200 * n) % bigw AS res
                        FROM strata CROSS JOIN w),
               alloc AS (SELECT lang,
                                base + CASE WHEN row_number() OVER
                                    (ORDER BY res DESC, lang)
                                  <= 200 - (SELECT sum(base) FROM calc)
                                  THEN 1 ELSE 0 END AS alloc
                         FROM calc),
               ranked AS (SELECT doc_id, lang,
                                 row_number() OVER (PARTITION BY lang
                                   ORDER BY ${Portable.p60Sql("CAST(doc_id AS VARCHAR)")},
                                            doc_id) AS rn
                          FROM documents)
               SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
               FROM ranked JOIN alloc USING (lang)
               WHERE rn <= alloc ORDER BY doc_id""")),

    // ---- deterministic per-group MODE — the exact argmax-of-counts
    // aggregate with a PINNED tie rule (highest count, then lowest
    // value), which Spark's built-in mode() deliberately leaves
    // unspecified on ties (engine/partition-order dependent — useless
    // for a reproducible pipeline). Formulation: count per (group,
    // value) — map-side combined, the only shuffle that sees data —
    // then a row_number pick over the |groups|·|values| aggregated
    // frame. Per-lang modal source with its count and the runner-up
    // gap (mode confidence), all exact integers.
    GraftQuery(
      "q202_mode_per_group",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = t(s, d, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
        val byLang = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("source"))
        counts
          .withColumn("rn", row_number().over(byLang))
          .withColumn("runner_up", lead(col("n"), 1).over(byLang))
          .filter(col("rn") === 1)
          .select(col("lang"), col("source").as("mode_source"), col("n"),
            (col("n") - coalesce(col("runner_up"), lit(0L))).as("lead_margin"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
                         FROM documents GROUP BY 1, 2),
              r AS (SELECT lang, source, n,
                           row_number() OVER w AS rn,
                           lead(n, 1) OVER w AS runner_up
                    FROM c WINDOW w AS (PARTITION BY lang ORDER BY n DESC, source))
              SELECT lang, source AS mode_source, n,
                     CAST(n - coalesce(runner_up, 0) AS BIGINT) AS lead_margin
              FROM r WHERE rn = 1 ORDER BY lang""")),

    // ---- temperature-scaled mixture weights (the multilingual
    // sampling recipe, mBERT/XLM-R style): sampling a 10k-doc training
    // budget ∝ n gives the head language most of the budget;
    // temperature flattens it — weight_l ∝ n_l^α with α = 0.3, so tail
    // languages are upsampled (effective epochs > 1) and the head is
    // capped. q193 is the α = 1 proportional face; this is the
    // α < 1 rebalanced one, allocated EXACTLY by the same
    // Prorate.largestRemainder (shares sum to the budget, ≤1-unit
    // deviation, no float-share leakage). Determinism: pow is the one
    // transcendental — both engines call it on identical integer-
    // valued doubles and the result is immediately scaled and rounded
    // to an integer weight at 1e6 (the q216 libm precedent: a 1-ulp
    // jitter at ~1e-15 relative cannot move a rounding boundary);
    // everything after is exact longs + one reporting division.
    GraftQuery(
      "q251_temperature_mixing",
      (s, d) => {
        // strata has THREE consumers below (the allocator, the n
        // re-join, the total) — without a lineage cut each re-derives
        // the corpus aggregation (5 scans in the uncut physical plan);
        // the frame is |langs| rows, so the eager localCheckpoint is
        // the q238/isotonic discipline, not a cache leak
        val strata = t(s, d, "documents")
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .select(lit(1L).as("grp"), col("lang"), col("n"),
            round(pow(col("n").cast("double"), lit(0.3)) * 1e6).cast("long")
              .as("w_temp"),
            lit(10000L).as("budget"))
          .localCheckpoint(true)
        val total = strata.agg(sum(col("n")).as("n_total"))
        graft.ops.Prorate.largestRemainder(strata,
            col("grp"), col("lang"), col("w_temp"), col("budget"))
          .select(col("id").as("lang"), col("weight"), col("alloc"))
          .join(strata.select(col("lang"), col("n")), "lang")
          .crossJoin(broadcast(total))
          .select(col("lang"), col("n"), col("weight"), col("alloc"),
            round(col("n").cast("double") / col("n_total").cast("double"), 6)
              .as("share_raw"),
            round(col("alloc").cast("double") / 10000.0, 6).as("share_temp"),
            round(col("alloc").cast("double") / col("n").cast("double"), 6)
              .as("epochs"))
          .orderBy(col("lang"))
      },
      Some("""WITH strata AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                     CAST(round(pow(CAST(count(*) AS DOUBLE),
                       CAST(0.3 AS DOUBLE)) * 1e6) AS BIGINT) AS w_temp
                   FROM documents GROUP BY 1),
              tot AS (SELECT sum(w_temp) AS bigw, sum(n) AS n_total
                      FROM strata),
              calc AS (SELECT lang, n, w_temp,
                              (10000 * w_temp) // bigw AS base,
                              (10000 * w_temp) % bigw AS res,
                              n_total
                       FROM strata CROSS JOIN tot),
              alloc AS (SELECT lang, n, w_temp AS weight, n_total,
                               CAST(base + CASE WHEN row_number() OVER
                                   (ORDER BY res DESC, lang)
                                 <= 10000 - (SELECT sum(base) FROM calc)
                                 THEN 1 ELSE 0 END AS BIGINT) AS alloc
                        FROM calc)
              SELECT lang, n, weight, alloc,
                     round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
                       AS share_raw,
                     round(CAST(alloc AS DOUBLE) / 10000.0, 6) AS share_temp,
                     round(CAST(alloc AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       AS epochs
              FROM alloc ORDER BY lang""")),

    // ---- Jensen–Shannon divergence between two sources' term
    // distributions — the SYMMETRIC, always-finite companion to the
    // drift family (q115 PSI needs bins, q191 KS needs an order,
    // q208 χ² blows up on rare cells; JSD is the one corpus-mixing
    // papers quote). Vocabulary is the top-1000 terms by combined
    // count under the (count DESC, term) total order (the q264 zipf
    // cut — non-binding on today's tiny synthetic vocab, the declared
    // cap at scale), distributions renormalized WITHIN the cap
    // (documented). Per-term contributions are identical IEEE chains
    // (exact-long divisions, one ln each); they are sign-mixed, so
    // the total is a defined-order head-seeded fold over the
    // term-sorted list (q282 convention). Scale: one token explode +
    // one |vocab| aggregate; the fold is a 1000-element list on one
    // row.
    GraftQuery(
      "q291_jsd_sources",
      (s, d) => {
        val tok = t(s, d, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"),
            explode(Portable.tokens(col("text"))).as("term"))
        val cnt = tok.groupBy(col("term"))
          .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ca"),
            sum(when(col("source") === "src1", 1L).otherwise(0L)).as("cb"))
          .orderBy((col("ca") + col("cb")).desc, col("term"))
          .limit(1000)
          .localCheckpoint(true) // <=1000 rows; totals + fold below
        val tot = cnt.agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
        val terms = cnt.crossJoin(broadcast(tot))
          .select(col("term"), col("ca"), col("cb"),
            (col("ca").cast("double") / col("sa").cast("double")).as("pa"),
            (col("cb").cast("double") / col("sb").cast("double")).as("pb"))
          .select(col("term"), col("ca"), col("cb"),
            (coalesce(when(col("ca") > 0,
              lit(0.5) * col("pa") *
                log(col("pa") / (lit(0.5) * (col("pa") + col("pb"))))),
              lit(0.0)) +
             coalesce(when(col("cb") > 0,
               lit(0.5) * col("pb") *
                 log(col("pb") / (lit(0.5) * (col("pa") + col("pb"))))),
               lit(0.0))).as("contrib"))
        val fold = {
          val xs = transform(array_sort(collect_list(
            struct(col("term"), col("contrib").as("term_v")))),
            e => e.getField("term_v"))
          aggregate(slice(xs, lit(2), size(xs) - 1), element_at(xs, 1),
            (acc, x) => acc + x)
        }
        terms.agg(count(lit(1)).as("n_terms"),
            sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
              .as("n_shared"),
            fold.as("jsd"))
          .select(col("n_terms"), col("n_shared"),
            round(col("jsd"), 6).as("jsd_nats"),
            round(col("jsd") / log(lit(2.0)), 6).as("jsd_bits"))
      },
      Some("""WITH tok AS (SELECT source,
                      unnest(string_split_regex(trim(text), '\s+')) AS term
                    FROM documents WHERE source IN ('src0', 'src1')),
              cnt AS (SELECT term,
                        CAST(sum(CASE WHEN source = 'src0'
                          THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                        CAST(sum(CASE WHEN source = 'src1'
                          THEN 1 ELSE 0 END) AS BIGINT) AS cb
                      FROM tok GROUP BY 1
                      ORDER BY ca + cb DESC, term LIMIT 1000),
              tot AS (SELECT CAST(sum(ca) AS BIGINT) AS sa,
                             CAST(sum(cb) AS BIGINT) AS sb FROM cnt),
              pr AS (SELECT term, ca, cb,
                       CAST(ca AS DOUBLE) / CAST(sa AS DOUBLE) AS pa,
                       CAST(cb AS DOUBLE) / CAST(sb AS DOUBLE) AS pb
                     FROM cnt CROSS JOIN tot),
              tm AS (SELECT term, ca, cb,
                       COALESCE(CASE WHEN ca > 0 THEN
                         CAST(0.5 AS DOUBLE) * pa
                           * ln(pa / (CAST(0.5 AS DOUBLE) * (pa + pb)))
                         END, CAST(0.0 AS DOUBLE))
                       + COALESCE(CASE WHEN cb > 0 THEN
                         CAST(0.5 AS DOUBLE) * pb
                           * ln(pb / (CAST(0.5 AS DOUBLE) * (pa + pb)))
                         END, CAST(0.0 AS DOUBLE)) AS contrib
                     FROM pr),
              fd AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
                       CAST(sum(CASE WHEN ca > 0 AND cb > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                       list_reduce(
                         list_transform(
                           list(struct_pack(term := term,
                                            term_v := contrib)
                             ORDER BY term),
                           e -> e.term_v),
                         (a, x) -> a + x) AS jsd
                     FROM tm)
              SELECT n_terms, n_shared, round(jsd, 6) AS jsd_nats,
                     round(jsd / ln(CAST(2.0 AS DOUBLE)), 6) AS jsd_bits
              FROM fd""")),

    // ---- k-anonymity audit — the privacy gate a corpus passes before
    // release: how many documents sit in quasi-identifier equivalence
    // classes smaller than k (here (lang, source, length-centile
    // bucket) — the metadata an adversary joins on), swept over the
    // standard k thresholds from ONE class-size frame (no rescan per
    // k). Every count exact; risk_share is one division of exact
    // longs. min_class_size = 1 means unique-fingerprint rows exist —
    // the headline number. Scale: one partial-aggregating pass to
    // |classes| rows; the sweep is a 4-way conditional aggregate over
    // that frame.
    GraftQuery(
      "q294_k_anonymity",
      (s, d) => {
        val g = t(s, d, "documents")
          .groupBy(col("lang"), col("source"), expr("n_chars DIV 100").as("szb"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // |classes| rows; swept 4 ways below
        val tot = g.agg(sum(col("n")).as("total"),
          count(lit(1)).as("n_classes"), min(col("n")).as("min_class"))
        g.crossJoin(broadcast(tot))
          .select(col("n"), col("total"), col("n_classes"), col("min_class"),
            explode(array(lit(2L), lit(5L), lit(10L), lit(20L))).as("k"))
          .groupBy(col("k"))
          .agg(max(col("n_classes")).as("n_classes"),
            max(col("min_class")).as("min_class_size"),
            sum(when(col("n") < col("k"), 1L).otherwise(0L))
              .as("n_violating_classes"),
            sum(when(col("n") < col("k"), col("n")).otherwise(0L))
              .as("docs_at_risk"),
            round(sum(when(col("n") < col("k"), col("n")).otherwise(0L))
              .cast("double") / max(col("total")).cast("double"), 6)
              .as("risk_share"))
          .orderBy(col("k"))
      },
      Some("""WITH g AS (SELECT lang, source, n_chars // 100 AS szb,
                     CAST(count(*) AS BIGINT) AS n
                   FROM documents GROUP BY 1, 2, 3),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                             CAST(count(*) AS BIGINT) AS n_classes,
                             CAST(min(n) AS BIGINT) AS min_class FROM g),
              sw AS (SELECT g.n, tot.total, tot.n_classes, tot.min_class,
                            k.k
                     FROM g CROSS JOIN tot
                     CROSS JOIN (SELECT unnest([2, 5, 10, 20]) AS k) k)
              SELECT CAST(k AS BIGINT) AS k,
                     max(n_classes) AS n_classes,
                     max(min_class) AS min_class_size,
                     CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating_classes,
                     CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
                       AS docs_at_risk,
                     round(CAST(sum(CASE WHEN n < k THEN n ELSE 0 END)
                         AS DOUBLE) / CAST(max(total) AS DOUBLE), 6)
                       AS risk_share
              FROM sw GROUP BY k ORDER BY k""")),

    // ---- leave-one-source-out impact — data valuation's cheapest
    // honest form: how much does REMOVING each source move the corpus
    // mean document length. LOO on a mean needs only the sufficient
    // statistics (n, Σ) per source — one pass, every source's
    // counterfactual priced simultaneously, no retraining/rescan per
    // source (the property that makes this viable at 100 TB where
    // true ablations are one-run-per-source). Deltas are differences
    // of two exact-long divisions (6dp-rounded at the edge); positive
    // delta = the corpus mean RISES without the source (it was
    // dragging quality down). Guard: a single-source corpus nulls the
    // counterfactual instead of dividing by zero.
    GraftQuery(
      "q295_loo_source_impact",
      (s, d) => {
        val g = t(s, d, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
          .localCheckpoint(true) // |sources| rows
        val tot = g.agg(sum(col("n")).as("tn"), sum(col("sc")).as("ts"))
        g.crossJoin(broadcast(tot))
          .select(col("source"), col("n").as("n_docs"),
            round(col("sc").cast("double") / col("n").cast("double"), 6)
              .as("mean_chars"),
            when(col("tn") > col("n"),
              round((col("ts") - col("sc")).cast("double") /
                (col("tn") - col("n")).cast("double") -
                col("ts").cast("double") / col("tn").cast("double"), 6))
              .as("loo_delta"))
          .orderBy(col("source"))
      },
      Some("""WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(n_chars) AS BIGINT) AS sc
                   FROM documents GROUP BY 1),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                             CAST(sum(sc) AS BIGINT) AS ts FROM g)
              SELECT source, n AS n_docs,
                     round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       AS mean_chars,
                     CASE WHEN tn > n THEN
                       round(CAST(ts - sc AS DOUBLE)
                           / CAST(tn - n AS DOUBLE)
                         - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE), 6)
                     END AS loo_delta
              FROM g CROSS JOIN tot ORDER BY source""")),

    // ---- l-diversity audit — q294's k-anonymity checks classes are
    // BIG enough; this checks the sensitive attribute inside each
    // class is VARIED enough (a class of 10,000 docs all from one
    // source still leaks membership the moment the adversary knows
    // the class). Quasi-identifiers here are (lang, length-centile
    // bucket); the sensitive attribute is `source`; l per class is an
    // exact countDistinct, swept over the standard l thresholds from
    // ONE class frame (the q294 no-rescan-per-threshold shape).
    // min_l = 1 is the headline: single-source classes exist. Scale:
    // one partial-aggregating pass to |classes| rows; the sweep is a
    // conditional aggregate over that frame.
    GraftQuery(
      "q311_l_diversity",
      (s, d) => {
        val g = t(s, d, "documents")
          .groupBy(col("lang"), expr("n_chars DIV 100").as("szb"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("source")).as("l"))
          .localCheckpoint(true) // |classes| rows; swept 3 ways below
        val tot = g.agg(sum(col("n")).as("total"),
          count(lit(1)).as("n_classes"), min(col("l")).as("min_l"))
        g.crossJoin(broadcast(tot))
          .select(col("n"), col("l"), col("total"), col("n_classes"),
            col("min_l"), explode(array(lit(2L), lit(3L), lit(5L))).as("lt"))
          .groupBy(col("lt"))
          .agg(max(col("n_classes")).as("n_classes"),
            max(col("min_l")).as("min_l"),
            sum(when(col("l") < col("lt"), 1L).otherwise(0L))
              .as("n_violating_classes"),
            sum(when(col("l") < col("lt"), col("n")).otherwise(0L))
              .as("docs_at_risk"),
            round(sum(when(col("l") < col("lt"), col("n")).otherwise(0L))
              .cast("double") / max(col("total")).cast("double"), 6)
              .as("risk_share"))
          .orderBy(col("lt"))
      },
      Some("""WITH g AS (SELECT lang, n_chars // 100 AS szb,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(count(DISTINCT source) AS BIGINT) AS l
                   FROM documents GROUP BY 1, 2),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                             CAST(count(*) AS BIGINT) AS n_classes,
                             CAST(min(l) AS BIGINT) AS min_l FROM g),
              sw AS (SELECT g.n, g.l, tot.total, tot.n_classes, tot.min_l,
                            k.lt
                     FROM g CROSS JOIN tot
                     CROSS JOIN (SELECT unnest([2, 3, 5]) AS lt) k)
              SELECT CAST(lt AS BIGINT) AS lt,
                     max(n_classes) AS n_classes,
                     max(min_l) AS min_l,
                     CAST(sum(CASE WHEN l < lt THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating_classes,
                     CAST(sum(CASE WHEN l < lt THEN n ELSE 0 END) AS BIGINT)
                       AS docs_at_risk,
                     round(CAST(sum(CASE WHEN l < lt THEN n ELSE 0 END)
                         AS DOUBLE) / CAST(max(total) AS DOUBLE), 6)
                       AS risk_share
              FROM sw GROUP BY lt ORDER BY lt""")),

    // ---- one exponentiated-gradient mixture-reweight step — the
    // DoReMi-shaped corpus-mixing move (Xie et al. 2023): upweight the
    // sources whose tokens the current model finds SURPRISING. The
    // "model" is the corpus's own global unigram distribution (the
    // q133/q69 convention — self-contained, no external LM), per-source
    // loss is mean cross-entropy of the source's tokens under it, and
    // the update is w'_s ∝ w0_s·exp(η·loss_s) with uniform w0 and η=1.
    // Determinism discipline: token counts are exact longs; each
    // per-source cross-entropy is a DEFINED-ORDER fold over the
    // (bounded-vocab) token list, and the normalizer Z folds the
    // per-source terms in source order — both engines replay one IEEE
    // sequence (the q291 JSD convention). Scale: one token scan to
    // |sources|×|vocab| exact counts; everything after runs on frames
    // bounded by the source and vocab domains.
    GraftQuery(
      "q313_mixture_reweight",
      (s, d) => graft.ops.Sampling.mixtureReweight(
          t(s, d, "documents"), col("source"), col("text"))
        .orderBy(col("source")),
      Some("""WITH tok AS (SELECT source,
                     unnest(string_split_regex(trim(text), '\s+')) AS tk
                   FROM documents),
              st AS (SELECT source, tk, CAST(count(*) AS BIGINT) AS c
                     FROM tok GROUP BY 1, 2),
              gcnt AS (SELECT tk, CAST(sum(c) AS BIGINT) AS ct
                       FROM st GROUP BY 1),
              tt AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM gcnt),
              per AS (SELECT source, CAST(sum(c) AS BIGINT) AS nt,
                        list_reduce(
                          list_transform(
                            list(struct_pack(tk := tk,
                                v := CAST(c AS DOUBLE)
                                  * -ln(CAST(ct AS DOUBLE)
                                        / CAST(tt AS DOUBLE)))
                              ORDER BY tk),
                            e -> e.v),
                          (acc, x) -> acc + x) AS ce
                      FROM st JOIN gcnt USING (tk) CROSS JOIN tt
                      GROUP BY source),
              ss AS (SELECT list(struct_pack(source := source, nt := nt,
                         loss := ce / CAST(nt AS DOUBLE)) ORDER BY source)
                       AS ss
                     FROM per),
              zz AS (SELECT ss, CAST(len(ss) AS DOUBLE) AS ns,
                       list_reduce(
                         list_transform(ss,
                           e -> exp(e.loss) / CAST(len(ss) AS DOUBLE)),
                         (acc, x) -> acc + x) AS z
                     FROM ss)
              SELECT u.source AS source, u.nt AS n_tokens,
                     round(CAST(u.nt AS DOUBLE) / CAST(tt AS DOUBLE), 6)
                       AS token_share,
                     round(u.loss, 6) AS xent_nats,
                     round((exp(u.loss) / ns) / z, 6) AS weight_new
              FROM zz CROSS JOIN tt, unnest(ss) AS t(u)
              ORDER BY source""")),

    // ---- cross-source quantile normalization — before mixing, map
    // each document's quality score (n_chars here) onto the GLOBAL
    // score distribution at the document's WITHIN-SOURCE percentile,
    // so a single global keep-threshold treats a "good for src3" doc
    // and a "good for src9" doc alike even when the sources' raw score
    // scales differ (the batch-effect correction step of corpus
    // mixing). Scale shape — no source-sized or corpus-sized row
    // window anywhere: the within-source rank is per-(source, value)
    // counts running-summed over the per-source VALUE domain (a
    // |values|-bounded window) plus a tiebreak window bounded by one
    // value's multiplicity; the global value-at-rank lookup is the
    // value-span frame (lo/hi global rank per distinct value, again a
    // |values|-bounded window) range-joined via the q127 binned
    // point-in-interval equi-join — never a broadcast NLJ, never a
    // corpus-wide row_number. The mapped index floor(pr·(N−1))+1 is
    // one double multiply + floor on identical inputs (both engines);
    // value-at-rank is tie-order independent, so the oracle may use
    // its plain global row_number while Spark uses spans. A 1-doc
    // source pins pr = 0.5 on both sides instead of dividing by zero.
    GraftQuery(
      "q314_quantile_normalize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .localCheckpoint(true) // scanned 4 ways below
        val svc = docs.groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("c"))
        val cumw = Window.partitionBy(col("source")).orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val svcum = svc
          .withColumn("cl", coalesce(sum(col("c")).over(cumw), lit(0L)))
          .select(col("source"), col("n_chars"), col("cl"))
        val ns = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
        val tiew = Window.partitionBy(col("source"), col("n_chars"))
          .orderBy(col("doc_id"))
        val nn = docs.agg(count(lit(1)).as("nn"))
        val pr = docs.withColumn("tb", row_number().over(tiew))
          .join(svcum, Seq("source", "n_chars"))
          .join(broadcast(ns), "source")
          .crossJoin(broadcast(nn))
          .select(col("doc_id"), col("source"), col("n_chars"), col("nn"),
            when(col("ns") > 1, (col("cl") + col("tb") - 1).cast("double")
              / (col("ns") - 1).cast("double"))
              .otherwise(lit(0.5)).as("pr"))
          .select(col("doc_id"), col("source"), col("n_chars"), col("pr"),
            (floor(col("pr") * (col("nn") - 1).cast("double")).cast("long")
              + 1).as("gi"))
        val gw = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // unpartitioned window — over the bounded VALUE domain, not rows
        val spans = docs.groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
          .withColumn("lo", coalesce(sum(col("c")).over(gw), lit(0L)) + 1)
          .select(col("v"), col("lo"), (col("lo") + col("c") - 1).as("hi"))
        graft.ops.RangeJoin
          .pointInInterval(pr, col("gi"), spans, col("lo"), col("hi"), 256L)
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(col("pr"), 6).as("src_pct"), col("v").as("qnorm"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH r AS (SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars, doc_id) AS rk,
                     count(*) OVER (PARTITION BY source) AS ns
                   FROM documents),
              n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
              pr AS (SELECT doc_id, source, n_chars,
                       CASE WHEN ns > 1 THEN
                         CAST(rk - 1 AS DOUBLE) / CAST(ns - 1 AS DOUBLE)
                       ELSE CAST(0.5 AS DOUBLE) END AS pr
                     FROM r),
              gi AS (SELECT doc_id, source, n_chars, pr,
                       CAST(floor(pr * CAST(nn - 1 AS DOUBLE)) AS BIGINT)
                         + 1 AS gi
                     FROM pr CROSS JOIN n),
              gv AS (SELECT n_chars AS v,
                       row_number() OVER (ORDER BY n_chars, doc_id) AS grk
                     FROM documents)
              SELECT g.doc_id, g.source, g.n_chars,
                     round(g.pr, 6) AS src_pct, gv.v AS qnorm
              FROM gi g JOIN gv ON gv.grk = g.gi
              ORDER BY doc_id""")),

    // ---- t-closeness audit — the third leg of the privacy triad:
    // q294 checks classes are big enough (k-anonymity), q311 that the
    // sensitive attribute is varied enough (l-diversity); this checks
    // it is varied THE RIGHT WAY — a class can hold all 33 sources
    // (l = 33) yet be 99% one source, and the skew itself leaks. Per
    // (lang, length-centile) class, distance-to-population is total
    // variation ½·Σ_s|p_class(s) − p_corpus(s)| (the categorical
    // instantiation of Machanavajjhala/Li's EMD — unordered sensitive
    // attribute, uniform ground distance). Exactness: each |·| term is
    // the cross-multiplied long |ncs·N − Ns·nc| (zero-count cells
    // included via the class×source grid — the missing-source term
    // Ns·nc is most of the distance for small classes), summed exact,
    // ONE double division by 2·nc·N per class; threshold compares and
    // risk tallies then run on identical IEEE doubles both engines.
    // Scale: one partial-agg pass to |classes×sources| cells; the grid
    // is |classes|×|sources| (broadcast the source margin), never a
    // row-level join. Swept over t ∈ {0.2, 0.3, 0.5} from one class
    // frame (the q294/q311 no-rescan convention).
    GraftQuery(
      "q317_t_closeness",
      (s, d) => {
        val cs = t(s, d, "documents")
          .groupBy(col("lang"), expr("n_chars DIV 100").as("szb"),
            col("source"))
          .agg(count(lit(1)).as("ncs"))
          .localCheckpoint(true) // |classes×sources| cells, read 3 ways
        val c = cs.groupBy(col("lang"), col("szb"))
          .agg(sum(col("ncs")).as("nc"))
        val srcs = cs.groupBy(col("source")).agg(sum(col("ncs")).as("ns"))
        val tot = srcs.agg(sum(col("ns")).as("n"))
        val tv = c.crossJoin(broadcast(srcs)).crossJoin(broadcast(tot))
          .join(cs, Seq("lang", "szb", "source"), "left")
          .select(col("lang"), col("szb"), col("nc"), col("n"),
            abs(coalesce(col("ncs"), lit(0L)) * col("n") -
              col("ns") * col("nc")).as("term"))
          .groupBy(col("lang"), col("szb"))
          .agg(max(col("nc")).as("nc"), sum(col("term")).as("num"),
            max(col("n")).as("n"))
          .select(col("nc"), (col("num").cast("double") /
            (lit(2L) * col("nc") * col("n")).cast("double")).as("tv"))
        tv.select(col("nc"), col("tv"),
            explode(array(lit(0.2), lit(0.3), lit(0.5))).as("tt"))
          .groupBy(col("tt"))
          .agg(count(lit(1)).as("n_classes"),
            round(max(col("tv")), 6).as("max_tv"),
            sum(when(col("tv") > col("tt"), 1L).otherwise(0L))
              .as("n_violating"),
            sum(when(col("tv") > col("tt"), col("nc")).otherwise(0L))
              .as("docs_at_risk"),
            round(sum(when(col("tv") > col("tt"), col("nc")).otherwise(0L))
              .cast("double") / sum(col("nc")).cast("double"), 6)
              .as("risk_share"))
          .orderBy(col("tt"))
      },
      Some("""WITH cs AS (SELECT lang, n_chars // 100 AS szb, source,
                     CAST(count(*) AS BIGINT) AS ncs
                   FROM documents GROUP BY 1, 2, 3),
              c AS (SELECT lang, szb, CAST(sum(ncs) AS BIGINT) AS nc
                    FROM cs GROUP BY 1, 2),
              s AS (SELECT source, CAST(sum(ncs) AS BIGINT) AS ns
                    FROM cs GROUP BY 1),
              tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM s),
              tv AS (SELECT g.lang, g.szb, max(g.nc) AS nc, max(g.n) AS n,
                            CAST(sum(abs(g.ncs * g.n - g.ns * g.nc))
                              AS BIGINT) AS num
                     FROM (SELECT c.lang, c.szb, c.nc, s.ns, tot.n,
                                  COALESCE(cs.ncs, 0) AS ncs
                           FROM c CROSS JOIN s CROSS JOIN tot
                           LEFT JOIN cs ON cs.lang = c.lang
                             AND cs.szb = c.szb AND cs.source = s.source) g
                     GROUP BY 1, 2),
              tvv AS (SELECT nc, CAST(num AS DOUBLE)
                          / CAST(2 * nc * n AS DOUBLE) AS tv FROM tv),
              sw AS (SELECT tvv.nc, tvv.tv, th.tt FROM tvv CROSS JOIN
                       (SELECT unnest([CAST(0.2 AS DOUBLE),
                                       CAST(0.3 AS DOUBLE),
                                       CAST(0.5 AS DOUBLE)]) AS tt) th)
              SELECT tt, CAST(count(*) AS BIGINT) AS n_classes,
                     round(max(tv), 6) AS max_tv,
                     CAST(sum(CASE WHEN tv > tt THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_violating,
                     CAST(sum(CASE WHEN tv > tt THEN nc ELSE 0 END)
                       AS BIGINT) AS docs_at_risk,
                     round(CAST(sum(CASE WHEN tv > tt THEN nc ELSE 0 END)
                         AS DOUBLE) / CAST(sum(nc) AS DOUBLE), 6)
                       AS risk_share
              FROM sw GROUP BY tt ORDER BY tt""")),

    // ---- Dirichlet-smoothed query-likelihood retrieval (Zhai &
    // Lafferty 2001) against q61's query bag — the LANGUAGE-MODEL
    // ranker next to q61's BM25, and the family's second scorer so
    // swapping retrieval stages is a measured decision (q341 prices
    // the ranking shift): score = Σ_t ln((tf + μ·cf_t/T)/(dl + μ)),
    // μ = 1000. Unlike BM25 every document is scored (absent terms
    // contribute the smoothed collection probability), so the
    // registered face is a top-20 — TakeOrderedAndProject on the RAW
    // double with doc-id tiebreak (equal-length docs matching no term
    // tie EXACTLY, so the tiebreak is load-bearing), never the full
    // ranking. tf/cf/dl/T exact longs; per-doc contributions fold in
    // ascending term order (ops.TextPipeline.queryLikelihood).
    GraftQuery(
      "q340_query_likelihood",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val top = TextPipeline.queryLikelihood(t(s, d, "documents"),
            Seq("spark", "table", "hash"), mu = 1000.0)
          .orderBy(col("ql").desc, col("id")).limit(20)
          .localCheckpoint(true) // 20 rows, re-windowed for rank
        top.select(
            row_number().over(Window.orderBy(col("ql").desc, col("id")))
              .cast("long").as("rank"),
            col("id").as("doc_id"), round(col("ql"), 6).as("ql"))
          .orderBy(col("rank"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS w
                   FROM documents),
              lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl
                       FROM toks),
              tt AS (SELECT CAST(sum(dl) AS BIGINT) AS t FROM lens),
              -- cf=0 (absent-everywhere) terms dropped, mirroring
              -- ops.TextPipeline.queryLikelihood: ln(0) would collapse
              -- every score and engines disagree on ln(0)
              cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf
                     FROM (SELECT unnest(w) AS term FROM toks)
                     WHERE term IN ('spark', 'table', 'hash') GROUP BY 1),
              tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                     FROM (SELECT doc_id, unnest(w) AS term FROM toks)
                     WHERE term IN ('spark', 'table', 'hash')
                     GROUP BY 1, 2),
              grid AS (SELECT lens.doc_id, lens.dl, cf.term,
                         ln((CAST(coalesce(tf.tf, 0) AS DOUBLE)
                             + 1000.0 * CAST(cf.cf AS DOUBLE)
                               / CAST(tt.t AS DOUBLE))
                            / (CAST(lens.dl AS DOUBLE) + 1000.0)) AS contrib
                       FROM lens CROSS JOIN cf CROSS JOIN tt
                       LEFT JOIN tf ON tf.doc_id = lens.doc_id
                                   AND tf.term = cf.term),
              sc AS (SELECT doc_id, list_reduce(list_transform(
                       list(struct_pack(term := term, c := contrib)
                         ORDER BY term), e -> e.c), (a, b) -> a + b) AS ql
                     FROM grid GROUP BY doc_id, dl),
              top AS (SELECT doc_id, ql, row_number() OVER
                        (ORDER BY ql DESC, doc_id) AS rnk FROM sc)
              SELECT CAST(rnk AS BIGINT) AS rank, doc_id,
                     round(ql, 6) AS ql
              FROM top WHERE rnk <= 20 ORDER BY rank""")),

    // ---- retrieval-portfolio telemetry: rank-biased overlap between
    // the BM25 (q61) and query-likelihood (q340) top-20 on the same
    // query bag — the q324 portfolio discipline applied to retrieval:
    // before swapping or blending scorers, operations reads how much
    // of what users SEE actually changes (RBO is top-weighted and
    // needs no relevance labels; ops.RankEval.rbo, q315's machinery
    // at k = 20). Both rankings cut on their documented keys (BM25's
    // 6dp-rounded score, QL's raw double; doc-id tiebreaks) so the
    // comparison is of the registered faces themselves. Scale: two
    // TakeOrderedAndProject top-20s + the k-bounded RBO fold.
    GraftQuery(
      "q341_retrieval_rank_shift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bag = Seq("spark", "table", "hash")
        val docs = t(s, d, "documents")
        val bm = TextPipeline.bm25(docs, bag)
          .orderBy(col("bm25").desc, col("id")).limit(20)
          .localCheckpoint(true) // 20 rows, re-windowed for rank
        val qlf = TextPipeline.queryLikelihood(docs, bag, mu = 1000.0)
          .orderBy(col("ql").desc, col("id")).limit(20)
          .localCheckpoint(true)
        val a = bm.select(col("id").as("pk"),
          row_number().over(Window.orderBy(col("bm25").desc, col("id")))
            .cast("long").as("rk"))
        val b = qlf.select(col("id").as("pk"),
          row_number().over(Window.orderBy(col("ql").desc, col("id")))
            .cast("long").as("rk"))
        a.agg(count(lit(1)).as("n_a"))
          .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
          .crossJoin(broadcast(
            graft.ops.RankEval.rbo(a, b, k = 20, p = 0.9)))
          .select(col("n_a"), col("n_b"), col("n_common"),
            col("agree_at_k"), col("rbo"), col("rbo_ub"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS w
                   FROM documents),
              lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl
                       FROM toks),
              dlens AS (SELECT doc_id, CAST(dl AS DOUBLE) AS dl FROM lens),
              stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                               avg(dl) AS avgdl FROM dlens),
              btf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                      FROM (SELECT doc_id, unnest(w) AS term FROM toks)
                      WHERE term IN ('spark', 'table', 'hash')
                      GROUP BY 1, 2),
              bdf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                      FROM btf GROUP BY 1),
              bsc AS (SELECT doc_id,
                        round(sum(idf * tf * 2.2
                          / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
                          AS bm25
                      FROM (SELECT t.doc_id, t.tf,
                              ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf,
                              dl, avgdl
                            FROM btf t JOIN bdf USING (term)
                            CROSS JOIN stats JOIN dlens USING (doc_id))
                      GROUP BY doc_id),
              ha AS (SELECT doc_id AS pk, row_number() OVER
                       (ORDER BY bm25 DESC, doc_id) AS ra FROM bsc
                     QUALIFY ra <= 20),
              tt AS (SELECT CAST(sum(dl) AS BIGINT) AS t FROM lens),
              -- cf=0 (absent-everywhere) terms dropped, mirroring
              -- ops.TextPipeline.queryLikelihood: ln(0) would collapse
              -- every score and engines disagree on ln(0)
              cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf
                     FROM (SELECT unnest(w) AS term FROM toks)
                     WHERE term IN ('spark', 'table', 'hash') GROUP BY 1),
              qtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                      FROM (SELECT doc_id, unnest(w) AS term FROM toks)
                      WHERE term IN ('spark', 'table', 'hash')
                      GROUP BY 1, 2),
              grid AS (SELECT lens.doc_id, lens.dl, cf.term,
                         ln((CAST(coalesce(qtf.tf, 0) AS DOUBLE)
                             + 1000.0 * CAST(cf.cf AS DOUBLE)
                               / CAST(tt.t AS DOUBLE))
                            / (CAST(lens.dl AS DOUBLE) + 1000.0)) AS contrib
                       FROM lens CROSS JOIN cf CROSS JOIN tt
                       LEFT JOIN qtf ON qtf.doc_id = lens.doc_id
                                    AND qtf.term = cf.term),
              qsc AS (SELECT doc_id, list_reduce(list_transform(
                        list(struct_pack(term := term, c := contrib)
                          ORDER BY term), e -> e.c), (a, b) -> a + b) AS ql
                      FROM grid GROUP BY doc_id, dl),
              hb AS (SELECT doc_id AS pk, row_number() OVER
                       (ORDER BY ql DESC, doc_id) AS rb FROM qsc
                     QUALIFY rb <= 20),
              mx AS (SELECT greatest(ra, rb) AS mx
                     FROM ha JOIN hb USING (pk)),
              xd AS (SELECT dd, CAST(count(mx) AS BIGINT) AS x
                     FROM generate_series(1, 20) g(dd)
                     LEFT JOIN mx ON mx <= dd GROUP BY dd),
              fold AS (SELECT list_reduce(
                         list_transform(
                           list(struct_pack(dd := dd, x := x) ORDER BY dd),
                           e -> power(0.9, CAST(e.dd - 1 AS DOUBLE))
                             * (CAST(e.x AS DOUBLE) / CAST(e.dd AS DOUBLE))),
                         (acc, t) -> acc + t) AS sm,
                       max(CASE WHEN dd = 20 THEN x END) AS xk
                       FROM xd),
              sz AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ha)
                         AS n_a,
                            (SELECT CAST(count(*) AS BIGINT) FROM hb)
                         AS n_b),
              nc AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM mx)
              SELECT sz.n_a, sz.n_b, nc.n_common,
                     round(CAST(fold.xk AS DOUBLE)
                       / CAST(20 AS DOUBLE), 6) AS agree_at_k,
                     round((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
                       * fold.sm, 6) AS rbo,
                     round((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
                       * fold.sm
                       + power(0.9, CAST(20 AS DOUBLE)), 6) AS rbo_ub
              FROM sz CROSS JOIN nc CROSS JOIN fold"""))
  )
}
