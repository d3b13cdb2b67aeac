package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Portable

/** Text-analysis operators over the `documents` table (SURVEY.md §7.4
  * "text analysis"): token counting (whitespace + a BPE-ish regex
  * segmenter), quality scoring, n-gram-marker language ID, and document
  * fingerprinting (full-text + rolling 8-gram winnowing).
  *
  * Everything is a per-row projection — embarrassingly parallel, no
  * shuffle except the final presentation sort, so these scale linearly
  * with document count at any SF.
  */
object TextQueries {
  import Tables.{apply => t}

  private val stopwords = graft.ops.TextPipeline.QualityStopwords
  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")
  // the same quoted list for oracles in other query modules (q110)
  private[queries] def stopListSql: String = stopList

  // language marker tokens for the n-gram-heuristic language ID
  private val markers = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "les", "des"))

  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  val all: Seq[GraftQuery] = Seq(

    // ---- token counting: whitespace tokens, distinct tokens, mean token
    // length, type/token ratio, BPE-ish regex segment count. Sums of
    // small-integer lengths are exact in doubles, so the divisions are
    // bit-identical across engines.
    GraftQuery(
      "q30_text_stats",
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"), col("text"), Portable.tokens(col("text")).as("w"))
          .select(
            col("doc_id"),
            size(col("w")).as("n_tokens"),
            size(array_distinct(col("w"))).as("n_distinct"),
            round(expr("aggregate(transform(w, t -> CAST(length(t) AS DOUBLE)), 0D, (a, x) -> a + x)")
              / size(col("w")), 6).as("avg_token_len"),
            round(size(array_distinct(col("w"))).cast("double") / size(col("w")), 6).as("ttr"),
            size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
               round(list_sum(list_transform(w, t -> CAST(length(t) AS DOUBLE))) / len(w), 6) AS avg_token_len,
               round(len(list_distinct(w)) * 1.0 / len(w), 6) AS ttr,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens
               FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents)
               ORDER BY doc_id""")),

    // ---- quality scoring: stopword ratio + length-based bucket (the
    // kind of heuristic filter an LLM-data pipeline runs before training).
    GraftQuery(
      "q31_text_quality",
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"), Portable.tokens(col("text")).as("w"))
          .select(
            col("doc_id"), col("n_chars"),
            size(col("w")).as("n_tokens"),
            expr(s"size(filter(w, t -> t IN ($stopList)))").as("n_stop"),
            round(expr(s"size(filter(w, t -> t IN ($stopList)))").cast("double")
              / size(col("w")), 6).as("stop_ratio"))
          .withColumn("quality",
            when(col("n_tokens") < 10, "too_short")
              .when(col("stop_ratio") > 0.5, "low")
              .otherwise("ok"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_chars, n_tokens, n_stop, stop_ratio,
               CASE WHEN n_tokens < 10 THEN 'too_short'
                    WHEN stop_ratio > 0.5 THEN 'low'
                    ELSE 'ok' END AS quality
               FROM (SELECT doc_id, n_chars, len(w) AS n_tokens,
                       len(list_filter(w, t -> t IN ($stopList))) AS n_stop,
                       round(len(list_filter(w, t -> t IN ($stopList))) * 1.0 / len(w), 6) AS stop_ratio
                     FROM (SELECT doc_id, n_chars, string_split_regex(trim(text), '\\s+') AS w FROM documents))
               ORDER BY doc_id""")),

    // ---- language ID by marker-token counts (n-gram heuristic): count
    // occurrences of per-language function words, argmax with a fixed
    // precedence order so ties are deterministic.
    GraftQuery(
      "q32_lang_id",
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
        val scored = markers.foldLeft(base) { case (df, (lang, ms)) =>
          val list = ms.map(m => s"'$m'").mkString(", ")
          df.withColumn(s"${lang}_n", expr(s"size(filter(w, t -> t IN ($list)))"))
        }
        scored
          .withColumn("predicted",
            when(col("en_n") >= greatest(col("de_n"), col("es_n"), col("fr_n")) && col("en_n") > 0, "en")
              .when(col("de_n") >= greatest(col("es_n"), col("fr_n")) && col("de_n") > 0, "de")
              .when(col("es_n") >= col("fr_n") && col("es_n") > 0, "es")
              .when(col("fr_n") > 0, "fr")
              .otherwise("unknown"))
          .select(col("doc_id"), col("en_n"), col("de_n"), col("es_n"), col("fr_n"), col("predicted"))
          .orderBy(col("doc_id"))
      },
      Some {
        val scoreCols = markers.map { case (lang, ms) =>
          val list = ms.map(m => s"'$m'").mkString(", ")
          s"len(list_filter(w, t -> t IN ($list))) AS ${lang}_n"
        }.mkString(",\n                       ")
        s"""SELECT doc_id, en_n, de_n, es_n, fr_n,
            CASE WHEN en_n >= greatest(de_n, es_n, fr_n) AND en_n > 0 THEN 'en'
                 WHEN de_n >= greatest(es_n, fr_n) AND de_n > 0 THEN 'de'
                 WHEN es_n >= fr_n AND es_n > 0 THEN 'es'
                 WHEN fr_n > 0 THEN 'fr'
                 ELSE 'unknown' END AS predicted
            FROM (SELECT doc_id, $scoreCols
                  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents))
            ORDER BY doc_id"""
      }),

    // ---- document fingerprinting: 60-bit hash of the normalized full
    // text plus a rolling-hash fingerprint (min over all char-8-gram
    // hashes — the winnowing idea, Schleimer et al. SIGMOD'03).
    GraftQuery(
      "q33_fingerprint",
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"), Portable.normText(col("text")).as("nt"))
          .select(
            col("doc_id"),
            Portable.p60(col("nt")).as("fp_full"),
            // one-pass codegen twin of
            //   array_min(transform(sequence(1, greatest(length-7,1)),
            //             i -> p60(substring(nt, i, 8))))
            // — same values, no per-doc 8-gram array materialization
            expr("p60_rolling8_min(nt)").as("fp_rolling"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
               ${Portable.p60Sql("nt")} AS fp_full,
               list_min([${Portable.p60Sql("substring(nt, i, 8)")}
                         FOR i IN range(1, greatest(length(nt) - 7, 1) + 1)]) AS fp_rolling
               FROM (SELECT doc_id, ${Portable.normTextSql("text")} AS nt FROM documents)
               ORDER BY doc_id""")),

    // ---- compression-ratio quality signal (deflate bytes / raw bytes;
    // repetitive junk compresses away). zlib output isn't
    // SQL-expressible -> rows-only; invariants in OpsSpec.
    GraftQuery(
      "q49_compression_quality",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.TextPipeline.compressionRatio(col("text")).as("deflate_ratio"),
          col("n_chars"))
        .orderBy(col("doc_id")),
      None, companion = Some("q93_compression_bounds")),

    // ---- exact deduplication: keep the lowest doc_id per normalized
    // fingerprint (hash-groupBy dedup — the 100 TB-safe exact-dup plan:
    // one shuffle on a 60-bit key, no driver state).
    GraftQuery(
      "q34_dedup_exact",
      (s, d) => graft.ops.Dedup.exact(t(s, d, "documents"))
        .select(col("doc_id"), col("n_chars"), col("n_copies"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, n_chars, n_copies FROM
                 (SELECT doc_id, n_chars, fp FROM
                   (SELECT doc_id, n_chars, ${Portable.p60Sql(Portable.normTextSql("text"))} AS fp FROM documents))
               JOIN (SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies
                     FROM (SELECT doc_id, ${Portable.p60Sql(Portable.normTextSql("text"))} AS fp FROM documents)
                     GROUP BY fp) USING (fp)
               WHERE doc_id = keep_id ORDER BY doc_id""")),

    // ---- cross-source duplicate matrix — q34's corpus-hygiene face:
    // exact-dup pairs (same normalized fingerprint) grouped by the
    // UNORDERED source pair, so the matrix answers "which crawlers
    // are re-feeding each other's content" (off-diagonal) and "which
    // source re-crawls itself" (diagonal) — the signal that decides
    // whose ingestion to dedup against whose corpus first. The corpus
    // is unioned with a deterministic 'recrawl' clone of the pmod-17
    // docs (the q189 clone convention) so the matrix is non-vacuous at
    // every SF — the generator only plants organic exact dups at
    // sf0.1. Scale: one fingerprint equi-join; per-fingerprint fanout
    // is n_copies² — dup groups are naturally tiny, and a pathological
    // viral text would be capped upstream exactly like the hot-shingle
    // df cap.
    GraftQuery(
      "q223_cross_source_dups",
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.select(col("doc_id"), col("source"), col("text"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(17)) === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              lit("recrawl").as("source"), col("text")))
        val fp = corpus
          .select(col("doc_id"), col("source"),
            Portable.p60(Portable.normText(col("text"))).as("fp"))
        val a = fp.select(col("fp"), col("doc_id").as("id1"),
          col("source").as("sa"))
        val b = fp.select(col("fp"), col("doc_id").as("id2"),
          col("source").as("sb"))
        a.join(b, Seq("fp"))
          .filter(col("id1") < col("id2"))
          .groupBy(least(col("sa"), col("sb")).as("src1"),
            greatest(col("sa"), col("sb")).as("src2"))
          .agg(count(lit(1)).as("n_dup_pairs"),
            countDistinct(col("fp")).as("n_shared_fps"))
          .orderBy(col("src1"), col("src2"))
      },
      Some(s"""WITH corpus AS (SELECT doc_id, source, text FROM documents
                               UNION ALL
                               SELECT doc_id + 1000000, 'recrawl', text
                               FROM documents WHERE doc_id % 17 = 0),
               fp AS (SELECT doc_id, source,
                             ${Portable.p60Sql(Portable.normTextSql("text"))} AS fp
                      FROM corpus),
               p AS (SELECT least(a.source, b.source) AS src1,
                            greatest(a.source, b.source) AS src2, a.fp
                     FROM fp a JOIN fp b
                       ON a.fp = b.fp AND a.doc_id < b.doc_id)
               SELECT src1, src2, CAST(count(*) AS BIGINT) AS n_dup_pairs,
                      CAST(count(DISTINCT fp) AS BIGINT) AS n_shared_fps
               FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Spearman rank correlation, exact-integer formulation: per
    // language, does document SIZE track WORD COUNT monotonically
    // (ρ near 1 = lengths are honest; a collapse flags a source
    // emitting padded or token-dense junk). Ranks are row_number over
    // a TOTAL order (metric, doc_id) — the deterministic tie-break,
    // documented deviation from classical average-ranks — so
    // d = rank_x − rank_y and Σd² are EXACT longs on both engines and
    // ρ = 1 − 6Σd²/(n(n²−1)) is one rounded division of identical
    // integers. Scale: two rank windows over per-language partitions
    // of the |docs|-frame plus one small aggregate.
    GraftQuery(
      "q224_spearman_size_words",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars"),
            size(split(trim(col("text")), "\\s+")).as("n_words"))
        val rx = Window.partitionBy(col("lang"))
          .orderBy(col("n_chars"), col("doc_id"))
        val ry = Window.partitionBy(col("lang"))
          .orderBy(col("n_words"), col("doc_id"))
        docs
          .withColumn("d",
            row_number().over(rx).cast("long") -
              row_number().over(ry).cast("long"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sumd2"))
          .filter(col("n") > 1)
          .select(col("lang"), col("n"), col("sumd2"),
            round(lit(1.0) -
              lit(6.0) * col("sumd2") /
                (col("n") * (col("n") * col("n") - 1)), 6).as("rho"))
          .orderBy(col("lang"))
      },
      Some("""WITH w AS (SELECT lang, doc_id, n_chars,
                                len(string_split_regex(trim(text), '\s+')) AS n_words
                         FROM documents),
              r AS (SELECT lang,
                           row_number() OVER (PARTITION BY lang
                             ORDER BY n_chars, doc_id)
                           - row_number() OVER (PARTITION BY lang
                             ORDER BY n_words, doc_id) AS d
                    FROM w),
              a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(d * d) AS BIGINT) AS sumd2
                    FROM r GROUP BY 1)
              SELECT lang, n, sumd2,
                     round(1 - CAST(6.0 AS DOUBLE) * sumd2
                           / (n * (n * n - 1)), 6) AS rho
              FROM a WHERE n > 1 ORDER BY lang""")),

    // ---- bigram collocations by PMI (vocab/tokenizer design telemetry:
    // which token pairs behave as units and deserve a merged vocab
    // entry). Bigram extraction is map-side (an indexed transform over
    // the token array — no self-join on position); unigram and bigram
    // counting partial-aggregate on the term keys; the two count joins
    // are vocab-keyed shuffles, never corpus-keyed. PMI uses natural
    // log with the identical operation shape on both engines, rounded
    // to 6dp before the top-20 cut (ties broken by the pair itself).
    // The cxy >= 5 support floor is standard practice: PMI explodes on
    // hapax pairs.
    GraftQuery(
      "q99_bigram_pmi",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(Portable.tokens(col("text")).as("w"))
        val uni = docs.select(explode(col("w")).as("x"))
          .filter(length(col("x")) > 0)
          .groupBy(col("x")).agg(count(lit(1)).as("cx"))
        val bi = docs
          .select(explode(expr(
            """transform(slice(w, 1, greatest(size(w) - 1, 0)),
               (t, i) -> struct(t AS x, element_at(w, i + 2) AS y))""")).as("b"))
          .select(col("b.x").as("x"), col("b.y").as("y"))
          .filter(length(col("x")) > 0 && length(col("y")) > 0)
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
        bi.filter(col("cxy") >= 5)
          .join(uni, "x")
          .join(uni.select(col("x").as("y"), col("cx").as("cy")), "y")
          .crossJoin(broadcast(uni.agg(sum(col("cx")).as("n_uni"))))
          .crossJoin(broadcast(bi.agg(sum(col("cxy")).as("n_bi"))))
          .select(col("x"), col("y"), col("cxy"),
            round(log((col("cxy") / col("n_bi")) /
              ((col("cx") / col("n_uni")) * (col("cy") / col("n_uni")))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("x"), col("y"))
          .limit(20)
      },
      Some("""WITH docs AS (SELECT string_split_regex(trim(text), '\s+') AS w
                            FROM documents),
              uni AS (SELECT x, CAST(count(*) AS BIGINT) AS cx
                      FROM (SELECT unnest(w) AS x FROM docs)
                      WHERE len(x) > 0 GROUP BY 1),
              bi AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
                     FROM (SELECT unnest(list_slice(w, 1, len(w) - 1)) AS x,
                                  unnest(list_slice(w, 2, len(w))) AS y
                           FROM docs)
                     WHERE len(x) > 0 AND len(y) > 0 GROUP BY 1, 2),
              nu AS (SELECT CAST(sum(cx) AS BIGINT) AS n_uni FROM uni),
              nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS n_bi FROM bi)
              SELECT bi.x, bi.y, cxy,
                     round(ln((cxy / n_bi) /
                       ((u1.cx / n_uni) * (u2.cx / n_uni))), 6) AS pmi
              FROM bi JOIN uni u1 ON u1.x = bi.x
                      JOIN uni u2 ON u2.x = bi.y, nu, nb
              WHERE cxy >= 5
              ORDER BY pmi DESC, bi.x, bi.y LIMIT 20""")),

    // ---- tokenizer fertility by language: chars per BPE-ish token and
    // tokens per whitespace word, per declared lang — the
    // tokenizer-efficiency numbers that decide vocab allocation across
    // languages (a lang with high chars/token is being under-served by
    // the vocab). Scan-side projections + one partial agg on the bounded
    // lang key; ratios computed AFTER the aggregate and rounded, so the
    // division order is engine-identical.
    GraftQuery(
      "q111_token_fertility",
      (s, d) => t(s, d, "documents")
        .select(col("lang"),
          col("n_chars"),
          size(Portable.tokens(col("text"))).cast("long").as("n_words"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
            .cast("long").as("n_bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          sum(col("n_words")).as("words"),
          sum(col("n_bpe")).as("bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("chars"), col("words"), col("bpe_tokens"),
          round(col("chars").cast("double") / col("bpe_tokens"), 6).as("chars_per_token"),
          round(col("bpe_tokens").cast("double") / col("words"), 6).as("fertility"))
        .orderBy(col("lang")),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS chars,
                     CAST(sum(n_words) AS BIGINT) AS words,
                     CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
                     round(sum(n_chars) * 1.0 / sum(n_bpe), 6) AS chars_per_token,
                     round(sum(n_bpe) * 1.0 / sum(n_words), 6) AS fertility
              FROM (SELECT lang, n_chars,
                           len(string_split_regex(trim(text), '\s+')) AS n_words,
                           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe
                    FROM documents)
              GROUP BY lang ORDER BY lang""")),

    // ---- declared-vs-detected language confusion matrix: q32's marker
    // detector against the corpus's own lang column — the mislabel
    // audit that decides whether a source's language metadata can be
    // trusted (off-diagonal mass = docs whose declared lang the
    // detector disputes). Scan-side scoring, one partial agg on the
    // bounded (declared, predicted) key.
    GraftQuery(
      "q121_lang_confusion",
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), Portable.tokens(col("text")).as("w"))
        val scored = markers.foldLeft(base) { case (df, (lang, ms)) =>
          val list = ms.map(m => s"'$m'").mkString(", ")
          df.withColumn(s"${lang}_n", expr(s"size(filter(w, t -> t IN ($list)))"))
        }
        scored
          .withColumn("predicted",
            when(col("en_n") >= greatest(col("de_n"), col("es_n"), col("fr_n")) && col("en_n") > 0, "en")
              .when(col("de_n") >= greatest(col("es_n"), col("fr_n")) && col("de_n") > 0, "de")
              .when(col("es_n") >= col("fr_n") && col("es_n") > 0, "es")
              .when(col("fr_n") > 0, "fr")
              .otherwise("unknown"))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some {
        val scoreCols = markers.map { case (lang, ms) =>
          val list = ms.map(m => s"'$m'").mkString(", ")
          s"len(list_filter(w, t -> t IN ($list))) AS ${lang}_n"
        }.mkString(",\n                       ")
        s"""SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs FROM
              (SELECT lang,
                      CASE WHEN en_n >= greatest(de_n, es_n, fr_n) AND en_n > 0 THEN 'en'
                           WHEN de_n >= greatest(es_n, fr_n) AND de_n > 0 THEN 'de'
                           WHEN es_n >= fr_n AND es_n > 0 THEN 'es'
                           WHEN fr_n > 0 THEN 'fr'
                           ELSE 'unknown' END AS predicted
               FROM (SELECT lang, $scoreCols
                     FROM (SELECT lang, string_split_regex(trim(text), '\\s+') AS w
                           FROM documents)))
            GROUP BY lang, predicted ORDER BY lang, predicted"""
      }),

    // ---- one BPE merge step, driver-checkable (graft.ops.Bpe — the
    // "train the tokenizer on the corpus" op; scale rationale there:
    // one corpus-scale word count, then everything runs vocab-sized):
    // count symbol pairs over the symbolized vocabulary, pick the
    // argmax merge (ties lexicographic — the determinism the whole
    // training run depends on), APPLY it with the greedy
    // non-overlapping rule, and emit the post-merge top-10 pair counts.
    // The oracle replays the identical step in SQL — the greedy
    // left-to-right application as a per-word recursive CTE walk — so a
    // divergence in counting, tie order, or application shows up as a
    // hash mismatch. The full training loop (Bpe.train) iterates
    // exactly this step; BpeSpec pins the classic multi-merge sequence.
    GraftQuery(
      "q130_bpe_merge_step",
      (s, d) => {
        val words = graft.ops.Bpe.wordCorpus(t(s, d, "documents"))
        // the chosen merge is a SCALAR decision — the one justified
        // driver collect per iteration (same pattern as CC convergence)
        val m = graft.ops.Bpe.topPair(words).get
        graft.ops.Bpe.pairCounts(graft.ops.Bpe.applyMergeDF(words, m.a, m.b))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(10)
      },
      Some("""WITH RECURSIVE
              toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents),
              wf AS (SELECT word, count(*) AS freq FROM toks WHERE word <> '' GROUP BY 1),
              syms AS (SELECT word, freq, list_append(string_split(word, ''), '</w>') AS s FROM wf),
              p1 AS (SELECT pr.a AS a, pr.b AS b, sum(freq) AS cnt
                     FROM (SELECT freq, unnest([{'a': s[i], 'b': s[i+1]} FOR i IN range(1, len(s))]) AS pr
                           FROM syms) GROUP BY 1, 2),
              mrg AS (SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
              walk(word, freq, s, i, out) AS (
                SELECT word, freq, s, 1, CAST([] AS VARCHAR[]) FROM syms
                UNION ALL
                SELECT w.word, w.freq, w.s,
                       CASE WHEN w.i < len(w.s) AND w.s[w.i] = m.a AND w.s[w.i+1] = m.b
                            THEN w.i + 2 ELSE w.i + 1 END,
                       CASE WHEN w.i < len(w.s) AND w.s[w.i] = m.a AND w.s[w.i+1] = m.b
                            THEN list_append(w.out, m.a || m.b)
                            ELSE list_append(w.out, w.s[w.i]) END
                FROM walk w CROSS JOIN mrg m WHERE w.i <= len(w.s)),
              merged AS (SELECT word, freq, out AS s FROM walk WHERE i = len(s) + 1),
              p2 AS (SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
                     FROM (SELECT freq, unnest([{'a': s[i], 'b': s[i+1]} FOR i IN range(1, len(s))]) AS pr
                           FROM merged) GROUP BY 1, 2)
              SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 10""")),

    // ---- the trained-tokenizer state applied back over the corpus:
    // after q130's merge step, every document's BPE token count (words
    // joined to the merged vocabulary, symbol counts summed) — the
    // per-document fertility of the tokenizer-in-training, the number
    // that drives q103-style batching and q85-style token budgeting.
    // Scan-side explode + a vocab-keyed join (vocab-sized build side)
    // + one per-doc aggregate. Oracle = q130's recursive greedy-walk
    // CTEs with one join back onto the per-doc word multiset.
    GraftQuery(
      "q136_bpe_fertility",
      (s, d) => {
        val docs = t(s, d, "documents")
        val words = graft.ops.Bpe.wordCorpus(docs)
        val m = graft.ops.Bpe.topPair(words).get
        val merged = graft.ops.Bpe.applyMergeDF(words, m.a, m.b)
        docs.select(col("doc_id"),
            explode(Portable.tokens(col("text"))).as("word"))
          .filter(col("word") =!= "")
          .join(merged.select(col("word"), size(col("syms")).as("n_syms")), "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE
              toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
              wf AS (SELECT word, count(*) AS freq FROM
                       (SELECT unnest(w) AS word FROM toks)
                     WHERE word <> '' GROUP BY 1),
              syms AS (SELECT word, freq, list_append(string_split(word, ''), '</w>') AS s FROM wf),
              p1 AS (SELECT pr.a AS a, pr.b AS b, sum(freq) AS cnt
                     FROM (SELECT freq, unnest([{'a': s[i], 'b': s[i+1]} FOR i IN range(1, len(s))]) AS pr
                           FROM syms) GROUP BY 1, 2),
              mrg AS (SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
              walk(word, s, i, out) AS (
                SELECT word, s, 1, CAST([] AS VARCHAR[]) FROM syms
                UNION ALL
                SELECT w.word, w.s,
                       CASE WHEN w.i < len(w.s) AND w.s[w.i] = m.a AND w.s[w.i+1] = m.b
                            THEN w.i + 2 ELSE w.i + 1 END,
                       CASE WHEN w.i < len(w.s) AND w.s[w.i] = m.a AND w.s[w.i+1] = m.b
                            THEN list_append(w.out, m.a || m.b)
                            ELSE list_append(w.out, w.s[w.i]) END
                FROM walk w CROSS JOIN mrg m WHERE w.i <= len(w.s)),
              merged AS (SELECT word, len(out) AS n_syms FROM walk WHERE i = len(s) + 1),
              docw AS (SELECT doc_id, unnest(w) AS word FROM toks)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                     CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens
              FROM docw JOIN merged USING (word)
              GROUP BY doc_id ORDER BY doc_id""")),

    // ---- corpus-level span scrubbing (TextPipeline.scrubSharedSpans —
    // the paragraph-dedup curation step: drop PASSAGES recurring across
    // >= 2 documents, keep the rest of each doc, reassemble). The
    // synthetic corpus's exact/near-dup doc families make the drop path
    // real: their aligned 10-token windows recur verbatim and get
    // scrubbed, while unique docs pass through intact. Output carries
    // the reassembled clean_text itself (any span mis-kept, mis-dropped
    // or mis-ORDERED in reassembly is a hash mismatch) plus the
    // kept/dropped telemetry.
    GraftQuery(
      "q131_span_scrub",
      (s, d) => graft.ops.TextPipeline
        .scrubSharedSpans(t(s, d, "documents"), windowTokens = 10, minDocs = 2)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                            FROM documents),
              spans AS (SELECT doc_id, i AS idx,
                               array_to_string(w[i*10+1 : i*10+10], ' ') AS span
                        FROM (SELECT doc_id, w,
                                     unnest(range(0, (len(w) - 1) // 10 + 1)) AS i
                              FROM toks WHERE len(w) > 0)),
              shared AS (SELECT span FROM
                           (SELECT span, count(DISTINCT doc_id) AS ndocs
                            FROM spans GROUP BY 1)
                         WHERE ndocs >= 2),
              kept AS (SELECT doc_id,
                              string_agg(span, ' ' ORDER BY idx) AS clean_text,
                              count(*) AS n_kept
                       FROM spans WHERE span NOT IN (SELECT span FROM shared)
                       GROUP BY doc_id),
              totals AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1)
              SELECT t.doc_id,
                     coalesce(k.clean_text, '') AS clean_text,
                     CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                     CAST(t.n_spans - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped
              FROM totals t LEFT JOIN kept k USING (doc_id)
              ORDER BY t.doc_id""")),

    // ---- the full multi-merge training LOOP, driver-checkable (q130
    // pins ONE merge step; this pins FIVE chained ones — selection,
    // tie order, greedy application and re-count all compounding, so
    // any iteration-structure drift diverges by step 5). Emits the
    // merge list in application order with selection-time counts, plus
    // the post-training top-10 pair counts. The oracle unrolls the
    // identical five iterations with the q134 iter() technique applied
    // to q130's recursive greedy-walk CTE — five chained
    // count→argmax→walk blocks in SQL; each m$k is MATERIALIZED
    // because DuckDB otherwise inlines the twice-referenced chain
    // (next walk + next pair count) and re-evaluates it 2^k times —
    // the SQL twin of the iterative-DataFrame recompute trap
    // pageRank's localCheckpoint discipline exists for. Spark-side
    // cost stays the documented shape: one corpus-scale word count,
    // then vocab-sized iterations with a single-row driver argmax.
    GraftQuery(
      "q140_bpe_train",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val (merges, words) = graft.ops.Bpe.train(
          t(s, d, "documents"), numMerges = 5, checkpointEvery = 2)
        val mergeRows = merges.zipWithIndex
          .map { case (m, i) => ("merge", i + 1, m.a, m.b, m.cnt) }
          .toDF("kind", "step", "a", "b", "cnt")
        val finalPairs = graft.ops.Bpe.pairCounts(words)
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(10)
          .select(lit("pair").as("kind"), lit(0).as("step"),
            col("a"), col("b"), col("cnt"))
        mergeRows.union(finalPairs)
          .orderBy(col("kind"), col("step"), col("cnt").desc, col("a"), col("b"))
      },
      Some {
        def iter(k: Int, prev: String): String =
          s"""p$k AS (SELECT pr.a AS a, pr.b AS b, sum(freq) AS cnt
                      FROM (SELECT freq, unnest([{'a': s[i], 'b': s[i+1]} FOR i IN range(1, len(s))]) AS pr
                            FROM $prev) GROUP BY 1, 2),
              mrg$k AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p$k
                        ORDER BY cnt DESC, a, b LIMIT 1),
              walk$k(word, freq, s, i, out) AS (
                SELECT word, freq, s, 1, CAST([] AS VARCHAR[]) FROM $prev
                UNION ALL
                SELECT w.word, w.freq, w.s,
                       CASE WHEN w.i < len(w.s) AND w.s[w.i] = m.a AND w.s[w.i+1] = m.b
                            THEN w.i + 2 ELSE w.i + 1 END,
                       CASE WHEN w.i < len(w.s) AND w.s[w.i] = m.a AND w.s[w.i+1] = m.b
                            THEN list_append(w.out, m.a || m.b)
                            ELSE list_append(w.out, w.s[w.i]) END
                FROM walk$k w CROSS JOIN mrg$k m WHERE w.i <= len(w.s)),
              m$k AS MATERIALIZED (SELECT word, freq, out AS s FROM walk$k WHERE i = len(s) + 1)"""
        s"""WITH RECURSIVE
            toks AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents),
            wf AS (SELECT word, count(*) AS freq FROM toks WHERE word <> '' GROUP BY 1),
            m0 AS MATERIALIZED (SELECT word, freq, list_append(string_split(word, ''), '</w>') AS s FROM wf),
            ${iter(1, "m0")},
            ${iter(2, "m1")},
            ${iter(3, "m2")},
            ${iter(4, "m3")},
            ${iter(5, "m4")},
            p6 AS (SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
                   FROM (SELECT freq, unnest([{'a': s[i], 'b': s[i+1]} FOR i IN range(1, len(s))]) AS pr
                         FROM m5) GROUP BY 1, 2)
            SELECT kind, step, a, b, cnt FROM (
              SELECT 'merge' AS kind, 1 AS step, a, b, cnt FROM mrg1
              UNION ALL SELECT 'merge', 2, a, b, cnt FROM mrg2
              UNION ALL SELECT 'merge', 3, a, b, cnt FROM mrg3
              UNION ALL SELECT 'merge', 4, a, b, cnt FROM mrg4
              UNION ALL SELECT 'merge', 5, a, b, cnt FROM mrg5
              UNION ALL SELECT 'pair', 0, a, b, cnt FROM
                (SELECT a, b, cnt FROM p6 ORDER BY cnt DESC, a, b LIMIT 10))
            ORDER BY kind, step, cnt DESC, a, b"""
      }),

    // ---- T5-style span-corruption pair generation
    // (TextPipeline.spanCorrupt — design rationale there: block-
    // deterministic hash masking instead of the order-dependent
    // sequential sampler, so the generator is one scan-side projection,
    // restartable and engine-replayable). Defaults ≈ the T5 paper's 15%
    // token corruption at mean span 3. The oracle rebuilds the entire
    // pair — sentinel numbering, masked remainders, short-final-block
    // clamping — with the identical p60 block walk, so input AND target
    // strings hash-match byte for byte.
    GraftQuery(
      "q239_span_corruption",
      (s, d) => graft.ops.TextPipeline.spanCorrupt(t(s, d, "documents"))
        .orderBy(col("doc_id")),
      Some(s"""WITH base AS (
                 SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                 FROM documents),
               b2 AS (SELECT doc_id, toks, len(toks) AS nt,
                             (len(toks) + 9) // 10 AS nb
                      FROM base WHERE len(toks) > 0),
               mbf AS (SELECT doc_id, toks, nt,
                              [b FOR b IN range(0, nb)
                                 IF ${Portable.p60Sql(
                                      "(doc_id::VARCHAR || ':' || b::VARCHAR)")}
                                    % 10000 < 5000] AS mb,
                              range(0, nb) AS blocks
                       FROM b2)
               SELECT doc_id,
                      CAST(nt AS INTEGER) AS n_tokens,
                      CAST(len(mb) AS INTEGER) AS n_spans,
                      CAST(COALESCE(list_sum(
                        [least(3, nt - b * 10) FOR b IN mb]), 0) AS BIGINT)
                        AS n_masked,
                      array_to_string(flatten(
                        [CASE WHEN list_contains(mb, b)
                              THEN ['<extra_id_' ||
                                    len([x FOR x IN mb IF x < b]) || '>']
                                   || toks[b * 10 + 4 : (b + 1) * 10]
                              ELSE toks[b * 10 + 1 : (b + 1) * 10] END
                         FOR b IN blocks]), ' ') AS input_text,
                      COALESCE(array_to_string(flatten(
                        [['<extra_id_' || len([x FOR x IN mb IF x < b]) || '>']
                         || toks[b * 10 + 1 : b * 10 + 3]
                         FOR b IN mb]), ' '), '') AS target_text
               FROM mbf ORDER BY doc_id""")),

    // ---- corpus diversity (distinct-n): the generation-diversity
    // metric repurposed as a corpus monitor — distinct n-grams / total
    // n-grams for n = 1, 2, 3. A template-heavy or near-duplicated
    // corpus shows a LOW distinct-2/-3 long before exact dedup fires
    // (q34 catches identical docs; this catches a thousand docs stamped
    // from one skeleton). ONE corpus scan fans each doc into its
    // n-grams scan-side (explicit empty-array guards for docs shorter
    // than n — Spark's sequence(0, -1) DESCENDS rather than returning
    // empty, DuckDB's range is end-exclusive; neither default agrees so
    // both are guarded); the aggregate is a per-n count + count
    // DISTINCT — exact here, and at 100 TB the drop-in sketch face is
    // the HLL family (q91's mergeable state) on the same gram frame.
    // Ratios are single divisions of exact longs, emitted unrounded.
    GraftQuery(
      "q247_distinct_ngrams",
      (s, d) => t(s, d, "documents")
        .select(Portable.tokens(col("text")).as("w"))
        .filter(size(col("w")) > 0)
        .select(explode(expr(
          """concat(
               transform(w, t -> struct(1 AS n, t AS g)),
               CASE WHEN size(w) >= 2
                    THEN transform(sequence(0, size(w) - 2),
                      i -> struct(2 AS n, concat_ws(' ', w[i], w[i + 1]) AS g))
                    ELSE array() END,
               CASE WHEN size(w) >= 3
                    THEN transform(sequence(0, size(w) - 3),
                      i -> struct(3 AS n,
                        concat_ws(' ', w[i], w[i + 1], w[i + 2]) AS g))
                    ELSE array() END)""")).as("ng"))
        .select(col("ng.n").as("n"), col("ng.g").as("g"))
        .groupBy(col("n"))
        .agg(count(lit(1)).as("total"),
          countDistinct(col("g")).as("uniq"))
        .select(col("n"), col("total"), col("uniq"),
          (col("uniq").cast("double") / col("total").cast("double"))
            .as("distinct_ratio"))
        .orderBy(col("n")),
      Some("""WITH toks AS (SELECT string_split_regex(trim(text), '\s+') AS w
                            FROM documents),
              tf AS (SELECT w FROM toks WHERE len(w) > 0),
              grams AS (
                SELECT 1 AS n, unnest(w) AS g FROM tf
                UNION ALL
                SELECT 2 AS n, unnest(CASE WHEN len(w) >= 2
                  THEN [w[i] || ' ' || w[i + 1] FOR i IN range(1, len(w))]
                  ELSE [] END) AS g FROM tf
                UNION ALL
                SELECT 3 AS n, unnest(CASE WHEN len(w) >= 3
                  THEN [w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
                        FOR i IN range(1, len(w) - 1)]
                  ELSE [] END) AS g FROM tf)
              SELECT n, CAST(count(*) AS BIGINT) AS total,
                     CAST(count(DISTINCT g) AS BIGINT) AS uniq,
                     CAST(count(DISTINCT g) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS distinct_ratio
              FROM grams GROUP BY 1 ORDER BY n""")),

    // ---- Zipf-law fit — the Benford of text (q252's cousin): natural
    // language's frequency-rank curve is a power law with alpha ≈ 1;
    // a template-stamped or synthetic corpus bends it. Alpha by OLS of
    // ln(freq) on ln(rank) over the distributed top-1000 terms (the
    // q97 bound), with every regression sum computed as a DEFINED-
    // ORDER fold over the ONE collected rank-sorted list — a
    // distributed sum of logs would be accumulation-order exposed
    // across engines, a list fold is not (the q198/q201 convention);
    // ln on identical integer-valued doubles is the q216 libm
    // precedent. One row: n_terms, alpha (the negated slope),
    // intercept, both 6dp.
    GraftQuery(
      "q264_zipf_alpha",
      (s, d) => {
        val tf = t(s, d, "documents")
          .select(explode(Portable.tokens(col("text"))).as("term"))
          .filter(length(col("term")) > 0)
          .groupBy(col("term")).agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("term"))
        val ranked = tf.orderBy(col("c").desc, col("term")).limit(1000)
          .select(col("c"), row_number().over(w).as("rk"))
        ranked
          .agg(array_sort(collect_list(struct(col("rk"), col("c")))).as("ls"))
          .select(expr("""aggregate(ls,
              named_struct('n', 0L, 'sx', CAST(0.0 AS DOUBLE),
                'sy', CAST(0.0 AS DOUBLE), 'sxy', CAST(0.0 AS DOUBLE),
                'sxx', CAST(0.0 AS DOUBLE)),
              (a, e) -> named_struct(
                'n', a.n + 1L,
                'sx', a.sx + ln(CAST(e.rk AS DOUBLE)),
                'sy', a.sy + ln(CAST(e.c AS DOUBLE)),
                'sxy', a.sxy + ln(CAST(e.rk AS DOUBLE)) * ln(CAST(e.c AS DOUBLE)),
                'sxx', a.sxx + ln(CAST(e.rk AS DOUBLE)) * ln(CAST(e.rk AS DOUBLE))))
            """).as("s"))
          .select(col("s.n").as("n_terms"),
            round(-(col("s.n").cast("double") * col("s.sxy") -
                col("s.sx") * col("s.sy")) /
              (col("s.n").cast("double") * col("s.sxx") -
                col("s.sx") * col("s.sx")), 6).as("alpha"),
            round((col("s.sy") - (col("s.n").cast("double") * col("s.sxy") -
                col("s.sx") * col("s.sy")) /
              (col("s.n").cast("double") * col("s.sxx") -
                col("s.sx") * col("s.sx")) * col("s.sx")) /
                col("s.n").cast("double"), 6).as("intercept"))
      },
      Some("""WITH tf AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                   FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
                           AS term FROM documents)
                   WHERE len(term) > 0 GROUP BY 1),
              top AS (SELECT c, row_number() OVER
                        (ORDER BY c DESC, term) AS rk
                      FROM tf ORDER BY c DESC, term LIMIT 1000),
              ls AS (SELECT list_sort(list(struct_pack(rk := rk, c := c)))
                       AS l FROM top),
              s AS (SELECT list_reduce(
                      list_prepend(struct_pack(n := CAST(0 AS BIGINT),
                        sx := CAST(0.0 AS DOUBLE), sy := CAST(0.0 AS DOUBLE),
                        sxy := CAST(0.0 AS DOUBLE), sxx := CAST(0.0 AS DOUBLE)),
                        list_transform(l, e -> struct_pack(n := CAST(e.rk AS BIGINT),
                          sx := ln(CAST(e.rk AS DOUBLE)),
                          sy := ln(CAST(e.c AS DOUBLE)),
                          sxy := ln(CAST(e.rk AS DOUBLE)) * ln(CAST(e.c AS DOUBLE)),
                          sxx := ln(CAST(e.rk AS DOUBLE)) * ln(CAST(e.rk AS DOUBLE))))),
                      (a, e) -> struct_pack(n := a.n + 1,
                        sx := a.sx + e.sx, sy := a.sy + e.sy,
                        sxy := a.sxy + e.sxy, sxx := a.sxx + e.sxx)) AS st
                    FROM ls)
              SELECT CAST(st.n AS BIGINT) AS n_terms,
                     round(-(CAST(st.n AS DOUBLE) * st.sxy - st.sx * st.sy)
                       / (CAST(st.n AS DOUBLE) * st.sxx - st.sx * st.sx), 6)
                       AS alpha,
                     round((st.sy - (CAST(st.n AS DOUBLE) * st.sxy
                           - st.sx * st.sy)
                         / (CAST(st.n AS DOUBLE) * st.sxx - st.sx * st.sx)
                         * st.sx) / CAST(st.n AS DOUBLE), 6)
                       AS intercept
              FROM s""")),

    // ---- Good-Turing unseen-mass estimate over TRIGRAM types:
    // p0 ≈ f1/N (Good 1953) with f1 = types occurring in exactly one
    // document and N = total (doc, type) postings — the number that
    // tells a training pipeline how under-sampled a source still is
    // (high singleton share = keep crawling; near zero = the source is
    // exhausted). Trigram shingles, not unigrams, deliberately: the
    // registration probe showed the generator's unigram vocabulary is
    // 31 closed-class types (f1 = 0 at every SF — vacuous), while the
    // trigram space is combinatorial (f1 = 9414 at sf0.001 falling to
    // 207 at sf0.1 — the corpus genuinely saturating its source,
    // which is exactly the signal the estimator exists to report).
    // One df exchange (the q101 frame, uncapped: pure aggregate, no
    // postings join for the cap to bound) folded to four exact-long
    // constants; p_unseen is the single division of exact longs,
    // emitted UNROUNDED. f2 rides along for the classic
    // r* = (r+1)·f_{r+1}/f_r discount audit downstream.
    GraftQuery(
      "q302_good_turing",
      (s, d) => graft.ops.Dedup.shingles(t(s, d, "documents"))
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df")).as("n_postings"),
          count(lit(1)).as("n_types"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("df") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("n_postings"), col("n_types"), col("f1"), col("f2"),
          (col("f1").cast("double") / col("n_postings").cast("double"))
            .as("p_unseen")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                            FROM documents),
              sh0 AS (SELECT DISTINCT doc_id, s FROM
                      (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                              FOR i IN range(1, len(w) - 1)]) AS s FROM toks)),
              d AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh0 GROUP BY s),
              a AS (SELECT CAST(sum(df) AS BIGINT) AS n_postings,
                           CAST(count(*) AS BIGINT) AS n_types,
                           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                           CAST(sum(CASE WHEN df = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
                    FROM d)
              SELECT n_postings, n_types, f1, f2,
                     CAST(f1 AS DOUBLE) / CAST(n_postings AS DOUBLE) AS p_unseen
              FROM a""")),

    // ---- Heaps'-law growth checkpoints over TRIGRAM types (same
    // unigram-vacuousness rationale as q302): type inventory after
    // each id-domain quartile of the corpus — the curve whose
    // flattening says when more of the same source stops buying new
    // types (the planning twin of q302's instantaneous p0). Cutoffs
    // are max(doc_id)·k DIV 4 (scale-free id-domain quartiles, no
    // global sort; the generator's ids are dense so the quartiles are
    // non-vacuous at every SF); inventory-at-cutoff comes from ONE
    // first_seen = min(doc_id) aggregate per type, so the four
    // checkpoints cost one type exchange total, not four corpus
    // scans — the property that makes the curve affordable at 100 TB.
    // All counts exact longs.
    GraftQuery(
      "q303_heaps_checkpoints",
      (s, d) => {
        val docs = t(s, d, "documents")
        val cuts = docs.agg(max(col("doc_id")).as("mx"))
          .select(explode(expr("sequence(1, 4)")).as("k"), col("mx"))
          .select(col("k"), expr("mx * k DIV 4").as("cutoff"))
        val first = graft.ops.Dedup.shingles(docs)
          .groupBy(col("s")).agg(min(col("id")).as("first_seen"))
        val vocab = first.crossJoin(broadcast(cuts))
          .filter(col("first_seen") <= col("cutoff"))
          .groupBy(col("k"), col("cutoff")).agg(count(lit(1)).as("n_types"))
        val vol = docs
          .select(col("doc_id"), size(Portable.tokens(col("text"))).cast("long").as("nt"))
          .crossJoin(broadcast(cuts))
          .filter(col("doc_id") <= col("cutoff"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        vocab.join(vol, "k")
          .select(col("k").cast("long").as("k"), col("cutoff"),
            col("n_docs"), col("n_tokens"), col("n_types"))
          .orderBy(col("k"))
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
              cuts AS (SELECT k, mx * k // 4 AS cutoff FROM mx, range(1, 5) t(k)),
              toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                       FROM documents),
              sh0 AS (SELECT DISTINCT doc_id, s FROM
                      (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                              FOR i IN range(1, len(w) - 1)]) AS s FROM toks)),
              fs AS (SELECT s, min(doc_id) AS first_seen FROM sh0 GROUP BY 1),
              vocab AS (SELECT k, cutoff, CAST(count(*) AS BIGINT) AS n_types
                        FROM fs, cuts WHERE first_seen <= cutoff GROUP BY 1, 2),
              dt AS (SELECT doc_id,
                            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
                     FROM documents),
              vol AS (SELECT k, CAST(count(*) AS BIGINT) AS n_docs,
                             CAST(sum(nt) AS BIGINT) AS n_tokens
                      FROM dt, cuts WHERE doc_id <= cutoff GROUP BY 1)
              SELECT CAST(v.k AS BIGINT) AS k, cutoff, n_docs, n_tokens, n_types
              FROM vocab v JOIN vol USING (k) ORDER BY k""")),

    // ---- token-budget waterfill across languages — the mixture
    // allocator behind "don't let the head language crowd out the
    // tail": given a budget (4/5 of total token mass — a scale-free
    // fraction, so the cut binds at every SF), find the integer water
    // level c* = max c with Σ min(n_i, c) ≤ B; languages below the
    // level keep everything, languages above are capped at it (on
    // this corpus: en capped, de/es/zh whole at every SF — both
    // branches live). ENTIRELY integer: the level is the first
    // violator's (B − P_{j−1}) DIV (k−j+1) over the count-ascending
    // order (the classic waterfill closed form; P/j/k from one window
    // pass over the |languages|-sized frame — the windows here are
    // bounded by the GROUP count, not the corpus). The corpus-scale
    // work is one per-language token aggregate; everything after is
    // |languages| rows. Chunk-level enforcement of the allocation is
    // Sampling.capPerKey's job; this query decides the levels.
    GraftQuery(
      "q305_budget_waterfill",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val psrc = t(s, d, "documents")
          .groupBy(col("lang"))
          .agg(sum(size(Portable.tokens(col("text"))).cast("long")).as("n"))
        val consts = psrc.agg(sum(col("n")).as("tot"), count(lit(1)).as("k"))
          .select(col("tot"), col("k"), expr("tot * 4 DIV 5").as("b"))
        val ord = w.orderBy(col("n"), col("lang"))
        val o = psrc.crossJoin(broadcast(consts))
          .withColumn("j", row_number().over(ord))
          .withColumn("pf", sum(col("n")).over(
            ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .withColumn("cj", expr("(b - (pf - n)) DIV (k - j + 1)"))
        // first violator by j (min struct, lexicographic) or, if the
        // budget covers everything, the max count (level above all)
        val capRow = o.agg(
            min(when(col("cj") < col("n"), struct(col("j"), col("cj")))).as("v"),
            max(col("n")).as("mx"))
          .select(coalesce(col("v.cj"), col("mx")).as("cap"))
        o.crossJoin(broadcast(capRow))
          .select(col("lang"), col("n").as("n_tokens"), col("b").as("budget"),
            col("cap"), least(col("n"), col("cap")).as("allocated"))
          .orderBy(col("lang"))
      },
      Some("""WITH psrc AS (SELECT lang,
                     CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n
                   FROM documents GROUP BY 1),
              c AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                           CAST(count(*) AS BIGINT) AS k,
                           CAST(sum(n) AS BIGINT) * 4 // 5 AS b FROM psrc),
              o AS (SELECT lang, n, b, k,
                      row_number() OVER (ORDER BY n, lang) AS j,
                      CAST(sum(n) OVER (ORDER BY n, lang
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pf
                    FROM psrc, c),
              cap AS (SELECT coalesce(
                        (SELECT (b - (pf - n)) // (k - j + 1) FROM o
                         WHERE (b - (pf - n)) // (k - j + 1) < n ORDER BY j LIMIT 1),
                        (SELECT max(n) FROM o)) AS cap)
              SELECT lang, n AS n_tokens, b AS budget, cap,
                     least(n, cap) AS allocated
              FROM o, cap ORDER BY lang""")),

    // ---- c-TF-IDF discriminative terms per source (Grootendorst's
    // BERTopic class-TF-IDF, arXiv:2203.05794 §3.3, applied with
    // source as the class): score(t, s) = tf_{t,s} · ln(1 + A/f_t)
    // where f_t is the term's corpus frequency and A the mean tokens
    // per class — WHAT each source contributes, where q154's per-lang
    // Misra-Gries answers what is merely FREQUENT (a term every source
    // shares scores near ln(1) regardless of count). Top-3 per source,
    // raw-double ranking with term tiebreak (both engines rank
    // identical IEEE doubles — exact-long counts, one division, one
    // ln; the q313 convention), 6dp rounding on the REPORTED score
    // only. Non-vacuous by probe: sources surface different term
    // triples (batch/line/order vs table/part/customer). Scale: one
    // token scan partial-aggregates to |sources|×|vocab| exact counts;
    // the window runs over that bounded frame, never over rows.
    GraftQuery(
      "q322_ctfidf_source_terms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = t(s, d, "documents")
          .select(col("source"),
            explode(Portable.tokens(lower(col("text")))).as("w"))
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // |sources×vocab| rows, read 3 ways
        val ft = tf.groupBy(col("w")).agg(sum(col("n")).as("f"))
        val a = tf.agg((sum(col("n")).cast("double") /
          countDistinct(col("source")).cast("double")).as("a"))
        val sc = tf.join(broadcast(ft), "w").crossJoin(broadcast(a))
          .select(col("source"), col("w"), col("n"),
            (col("n").cast("double") *
              log(lit(1d) + col("a") / col("f").cast("double"))).as("score"))
        sc.withColumn("rn", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("score").desc, col("w"))))
          .filter(col("rn") <= 3)
          .select(col("source"), col("w").as("term"), col("n"),
            round(col("score"), 6).as("score"), col("rn").cast("long").as("rn"))
          .orderBy(col("source"), col("rn"))
      },
      Some("""WITH tok AS (SELECT source,
                     unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
                   FROM documents),
              tf AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n
                     FROM tok GROUP BY 1, 2),
              ft AS (SELECT w, CAST(sum(n) AS BIGINT) AS f FROM tf GROUP BY 1),
              a AS (SELECT CAST(sum(n) AS DOUBLE)
                        / CAST(count(DISTINCT source) AS DOUBLE) AS a FROM tf),
              sc AS (SELECT source, w, n,
                       CAST(n AS DOUBLE) * ln(1 + a.a / CAST(f AS DOUBLE))
                         AS score
                     FROM tf JOIN ft USING (w) CROSS JOIN a),
              rk AS (SELECT source, w, n, score,
                       row_number() OVER (PARTITION BY source
                         ORDER BY score DESC, w) AS rn
                     FROM sc)
              SELECT source, w AS term, n, round(score, 6) AS score,
                     CAST(rn AS BIGINT) AS rn
              FROM rk WHERE rn <= 3 ORDER BY source, rn""")),

    // ---- novelty-weighted data selection under a document budget —
    // the SELECTION member of the coverage family (q302 prices unseen
    // mass, q303 says when a source saturates, q305 splits a token
    // budget; this picks WHICH documents to keep): each doc scores
    // Σ over its distinct trigrams of (N_docs − df), the exact-long
    // rarity mass that is the standard one-shot proxy for greedy
    // max-coverage marginal gain — true greedy facility-location is k
    // sequential rounds each rescoring the corpus and cannot run as a
    // dataflow; the decoupled score is the selection that DISTRIBUTES.
    // Budget k = max(N DIV 20, 1) (a scale-free 5%). The achieved
    // trigram-type coverage rides along as constant columns, and the
    // probe prices the score against the null policy: the novelty-5%
    // covers 2313/2234/15495 types across sf0.001/0.01/0.1 where a
    // hash-random 5% covers 1358/1467/10399 — 1.70×/1.52×/1.49×. (On
    // this generator the novelty and length orderings nearly coincide
    // — 24/25 and 244/250 shared picks — because doc structure is
    // uniform; the rarity term is what diverges them on a corpus with
    // real template skew.)
    // Scale: df is one map-combining aggregate; the score join is the
    // postings equi-join at 1:1 fan-out (no df² pair hazard, so no cap
    // needed — the q35-family cap exists for pair joins); top-k is
    // TakeOrderedAndProject (per-partition heaps + k-merge, never a
    // global sort — a row_number window here would sort the corpus in
    // one task); the budget scalar is a 1-row count action (the
    // k-bounded-collect class — Spark's limit() needs a literal).
    GraftQuery(
      "q331_novelty_selection",
      (s, d) => {
        val docs = t(s, d, "documents")
        val sh = graft.ops.Dedup.shingles(docs)
          .localCheckpoint(true) // feeds df, scores and coverage
        val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .localCheckpoint(true) // feeds score join and type total
        val nDocs = docs.count() // 1-row scalar: sizes the limit() budget
        val k = math.max((nDocs / 20L).toInt, 1)
        val sel = sh.join(df, "s")
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_types"),
            sum(lit(nDocs) - col("df")).as("novelty"))
          .orderBy(col("novelty").desc, col("id"))
          .limit(k)
          .localCheckpoint(true) // k rows, read twice (output + coverage)
        val cov = sh.join(sel.select(col("id")), Seq("id"), "left_semi")
          .agg(countDistinct(col("s")).as("types_covered"))
        val tot = df.agg(count(lit(1)).as("types_total"))
        sel.crossJoin(broadcast(cov)).crossJoin(broadcast(tot))
          .select(col("id").as("doc_id"), col("n_types"), col("novelty"),
            col("types_covered"), col("types_total"),
            round(col("types_covered").cast("double") /
              col("types_total").cast("double"), 6).as("type_coverage"))
          .orderBy(col("novelty").desc, col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS w
                   FROM documents),
              sh AS (SELECT DISTINCT doc_id, s FROM
                     (SELECT doc_id,
                        unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                FOR i IN range(1, len(w) - 1)]) AS s
                      FROM toks)),
              df AS (SELECT s, CAST(count(*) AS BIGINT) AS df
                     FROM sh GROUP BY 1),
              ndc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
              scd AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_types,
                             CAST(sum(ndc.n - df.df) AS BIGINT) AS novelty
                      FROM sh JOIN df USING (s) CROSS JOIN ndc
                      GROUP BY 1),
              sel AS (SELECT doc_id, n_types, novelty FROM
                        (SELECT scd.*, row_number() OVER
                           (ORDER BY novelty DESC, doc_id) AS rn,
                           greatest(ndc.n // 20, 1) AS k
                         FROM scd CROSS JOIN ndc)
                      WHERE rn <= k),
              cov AS (SELECT CAST(count(DISTINCT s) AS BIGINT)
                          AS types_covered
                      FROM sh JOIN sel USING (doc_id)),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS types_total
                      FROM df)
              SELECT sel.doc_id, sel.n_types, sel.novelty,
                     cov.types_covered, tot.types_total,
                     round(CAST(cov.types_covered AS DOUBLE)
                         / CAST(tot.types_total AS DOUBLE), 6)
                       AS type_coverage
              FROM sel CROSS JOIN cov CROSS JOIN tot
              ORDER BY novelty DESC, doc_id"""))
  )

  /** Spark-SQL fragment of [[Portable.p60]] for use inside `expr` lambdas
    * (higher-order functions can't reference pre-built Columns). */
  private def sparkP60(e: String): String = s"p60($e)"
}
