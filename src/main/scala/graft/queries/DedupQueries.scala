package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Portable

/** Near-duplicate detection over `documents` (SURVEY.md §7.4 "dedup"):
  * exact n-gram Jaccard via an inverted-index self-join, MinHash+LSH
  * (shingle → signature → band → bucket-join), and SimHash with banded
  * Hamming candidate generation.
  *
  * Scale shape: every operator here is shuffle-joins + hash-aggregates on
  * bounded keys (shingle, band value, byte band) — no driver state, no
  * O(n²) pair enumeration except *within* candidate buckets, which is the
  * standard LSH trade. At 100 TB you'd additionally drop stop-shingles
  * (document-frequency cap) before the join; at test SFs exactness keeps
  * the DuckDB oracle checkable.
  *
  * The reference's own similarity is an exhaustive broadcast loop
  * (COMP5349_2.py:29-47); these are the sublinear replacements it lacks.
  */
object DedupQueries {
  import Tables.{apply => t}

  /** word 3-gram shingle set per document (distinct). Cached: every
    * consumer fans out into 3-4 plan branches (sizes, both join sides,
    * signatures) and recomputing the explode+distinct per branch
    * dominates runtime. At cluster scale this is persist(DISK_ONLY) on
    * the same plan shape. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("s"))
      .distinct()
      .cache()

  /** Same shingle set as DuckDB CTEs (1-based list indexing there). */
  private val shinglesSql =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
       sh AS (SELECT DISTINCT doc_id, s FROM
               (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       FOR i IN range(1, len(w) - 1)]) AS s FROM toks))"""

  private val P = Portable.MinHashPrime // 2^31-1
  private val K = 16                    // minhash signature length
  private val BandRows = 4              // LSH: 4 bands x 4 rows

  val all: Seq[GraftQuery] = Seq(

    // ---- exact n-gram Jaccard near-dup join. Inverted-index pattern:
    // explode shingles, equi-join on the shingle (shuffle join — scales
    // with postings-list sizes, not with |docs|²), count intersections,
    // Jaccard from |A|+|B|-|A∩B|.
    GraftQuery(
      "q35_ngram_jaccard",
      (s, d) => {
        val sh = shingles(s, d)
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val a = sh.select(col("doc_id").as("d1"), col("s"))
        val b = sh.select(col("doc_id").as("d2"), col("s").as("s2"))
        val inter = a.join(b, col("s") === col("s2") && col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
        inter
          .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
          .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
          .select(col("d1"), col("d2"),
            round(col("c").cast("double") / (col("n1") + col("n2") - col("c")), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.1)
          .orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH $shinglesSql,
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
                         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
               SELECT d1, d2, jaccard FROM
                 (SELECT d1, d2, round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
                  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id)
               WHERE jaccard >= 0.1 ORDER BY d1, d2""")),

    // ---- MinHash + LSH: 16 portable-hash permutations min-folded into a
    // signature, banded 4x4; docs sharing any band value become candidate
    // pairs, then both the minhash estimate and the exact Jaccard are
    // reported for each candidate. Sub-quadratic: candidates come from
    // the band-value equi-join, never from pair enumeration.
    GraftQuery(
      "q36_minhash_lsh",
      (s, d) => {
        val sh = shingles(s, d)
        val hx = sh.select(col("doc_id"), (Portable.p60(col("s")) % P).as("hx"))
        val sig = hx
          .withColumn("i", explode(sequence(lit(0), lit(K - 1))))
          .withColumn("hv", expr(s"(CAST(2*i+3 AS BIGINT) * hx + CAST(5*i+7 AS BIGINT)) % $P"))
          .groupBy(col("doc_id"), col("i")).agg(min(col("hv")).as("m"))
        val band = sig
          .groupBy(col("doc_id"), (col("i") / BandRows).cast("int").as("b"))
          .agg(expr("array_join(transform(array_sort(collect_list(struct(i, m))), x -> CAST(x.m AS STRING)), ':')").as("v"))
        // cached: the candidate set feeds est, the doc restriction, and
        // the final assembly — without it the whole signature pipeline
        // re-runs per branch
        val cand = band.select(col("doc_id").as("d1"), col("b"), col("v"))
          .join(band.select(col("doc_id").as("d2"), col("b").as("b2"), col("v").as("v2")),
            col("b") === col("b2") && col("v") === col("v2") && col("d1") < col("d2"))
          .select(col("d1"), col("d2")).distinct()
          .cache()
        val s1 = sig.select(col("doc_id").as("d1"), col("i"), col("m").as("m1"))
        val s2 = sig.select(col("doc_id").as("d2x"), col("i").as("i2"), col("m").as("m2"))
        val est = cand.join(s1, "d1")
          .join(s2, col("d2") === col("d2x") && col("i") === col("i2"))
          .groupBy(col("d1"), col("d2"))
          .agg(round(sum(when(col("m1") === col("m2"), 1).otherwise(0)).cast("double") / K, 4).as("est_jaccard"))
        // exact-jaccard verification only needs candidate docs — restrict
        // the shingle self-join to them (LSH found ~1% of docs; the
        // full-corpus join would dominate this query's cost). Shingle
        // sets are unchanged per doc, so sizes/intersections are exact.
        val candDocs = cand.select(col("d1").as("doc_id"))
          .union(cand.select(col("d2").as("doc_id"))).distinct()
        val shC = sh.join(candDocs, "doc_id").cache()
        val sizes = shC.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val a = shC.select(col("doc_id").as("d1"), col("s"))
        val b = shC.select(col("doc_id").as("d2"), col("s").as("s2"))
        val inter = a.join(b, col("s") === col("s2") && col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
        est
          .join(inter, Seq("d1", "d2"), "left").na.fill(0L, Seq("c"))
          .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
          .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
          .select(col("d1"), col("d2"), col("est_jaccard"),
            round(col("c").cast("double") / (col("n1") + col("n2") - col("c")), 6).as("jaccard"))
          .orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH $shinglesSql,
               hx AS (SELECT doc_id, ${Portable.p60Sql("s")} % $P AS hx FROM sh),
               sig AS (SELECT doc_id, i, min((CAST(2*i+3 AS BIGINT) * hx + CAST(5*i+7 AS BIGINT)) % $P) AS m
                       FROM hx, range(0, $K) t(i) GROUP BY doc_id, i),
               band AS (SELECT doc_id, CAST(i // $BandRows AS INTEGER) AS b,
                               string_agg(CAST(m AS VARCHAR), ':' ORDER BY i) AS v
                        FROM sig GROUP BY 1, 2),
               cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                        FROM band a JOIN band b ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id),
               est AS (SELECT c.d1, c.d2,
                              round(CAST(sum(CASE WHEN s1.m = s2.m THEN 1 ELSE 0 END) AS DOUBLE) / $K, 4) AS est_jaccard
                       FROM cand c JOIN sig s1 ON s1.doc_id = c.d1 JOIN sig s2 ON s2.doc_id = c.d2 AND s1.i = s2.i
                       GROUP BY 1, 2),
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
                         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
               SELECT e.d1, e.d2, e.est_jaccard,
                      round(coalesce(i.c, 0) * 1.0 / (s1.n + s2.n - coalesce(i.c, 0)), 6) AS jaccard
               FROM est e LEFT JOIN inter i ON e.d1 = i.d1 AND e.d2 = i.d2
               JOIN sizes s1 ON e.d1 = s1.doc_id JOIN sizes s2 ON e.d2 = s2.doc_id
               ORDER BY e.d1, e.d2""")),

    // ---- MinHash signatures via the typed Aggregator (same permutations
    // as q36, computed as a distributive sketch: map-side partial
    // signatures merge elementwise, so the shuffle carries k longs per
    // doc instead of the shingle postings). Oracle = the q36 sig CTE.
    GraftQuery(
      "q39_minhash_signatures",
      (s, d) => {
        val hx = shingles(s, d)
          .select(col("doc_id"), (Portable.p60(col("s")) % P).as("hx"))
        val mh = udaf(new graft.ops.MinHashSignature(K))
        hx.groupBy(col("doc_id")).agg(mh(col("hx")).as("sig"))
          .select(col("doc_id"),
            expr("array_join(transform(sig, x -> CAST(x AS STRING)), ':')").as("sig_str"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $shinglesSql,
               hx AS (SELECT doc_id, ${Portable.p60Sql("s")} % $P AS hx FROM sh),
               sig AS (SELECT doc_id, i, min((CAST(2*i+3 AS BIGINT) * hx + CAST(5*i+7 AS BIGINT)) % $P) AS m
                       FROM hx, range(0, $K) t(i) GROUP BY doc_id, i)
               SELECT doc_id, string_agg(CAST(m AS VARCHAR), ':' ORDER BY i) AS sig_str
               FROM sig GROUP BY doc_id ORDER BY doc_id""")),

    // ---- SimHash: 32-bit fingerprint; per token-occurrence each bit
    // contributes +1/-1 by the token hash's bit, fingerprint takes the
    // sign. A single groupBy(doc, bit) + groupBy(doc) — linear.
    GraftQuery(
      "q37_simhash",
      (s, d) => {
        // one-pass codegen twin of the exploded formulation (the oracle
        // below still spells it out relationally): per token occurrence,
        // bit j of the 32-bit token hash votes +1/-1; fingerprint takes
        // the sign. A projection — no generate, no aggregate exchanges.
        t(s, d, "documents")
          .select(col("doc_id"), Portable.tokens(col("text")).as("w"))
          .select(col("doc_id"), expr("simhash32(w)").as("simhash"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tk FROM documents),
               h32 AS (SELECT doc_id, ${Portable.p60Sql("tk")} % 4294967296 AS h FROM tok),
               v AS (SELECT doc_id, j,
                            sum(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
                     FROM h32, range(0, 32) t(j) GROUP BY doc_id, j)
               SELECT doc_id,
                      CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
               FROM v GROUP BY doc_id ORDER BY doc_id""")),

    // ---- SimHash near-dup pairs: block on the 4 bytes of the
    // fingerprint (a pair must agree on at least one byte to be a
    // candidate — pigeonhole holds for hamming <= 7 spread over bytes),
    // then verify Hamming distance on candidates only.
    GraftQuery(
      "q38_simhash_pairs",
      (s, d) => {
        val fp = all.find(_.name == "q37_simhash").get.build(s, d)
        val banded = fp.withColumn("k", explode(sequence(lit(0), lit(3))))
          .withColumn("byte", expr("(simhash DIV CAST(pow(2, 8 * k) AS BIGINT)) % 256"))
        val cand = banded.select(col("doc_id").as("d1"), col("simhash").as("h1"), col("k"), col("byte"))
          .join(banded.select(col("doc_id").as("d2"), col("simhash").as("h2"), col("k").as("k2"), col("byte").as("byte2")),
            col("k") === col("k2") && col("byte") === col("byte2") && col("d1") < col("d2"))
          .select(col("d1"), col("d2"), col("h1"), col("h2")).distinct()
        cand
          .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
          .filter(col("hamming") <= 2)
          .select(col("d1"), col("d2"), col("hamming"))
          .orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tk FROM documents),
               h32 AS (SELECT doc_id, ${Portable.p60Sql("tk")} % 4294967296 AS h FROM tok),
               v AS (SELECT doc_id, j,
                            sum(CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
                     FROM h32, range(0, 32) t(j) GROUP BY doc_id, j),
               fp AS (SELECT doc_id,
                             CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
                      FROM v GROUP BY doc_id),
               banded AS (SELECT doc_id, simhash, k, (simhash // CAST(pow(2, 8 * k) AS BIGINT)) % 256 AS byte
                          FROM fp, range(0, 4) t(k)),
               cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS h1, b.simhash AS h2
                        FROM banded a JOIN banded b
                          ON a.k = b.k AND a.byte = b.byte AND a.doc_id < b.doc_id)
               SELECT d1, d2, bit_count(xor(h1, h2)) AS hamming FROM cand
               WHERE bit_count(xor(h1, h2)) <= 2 ORDER BY d1, d2"""))
  )
}
