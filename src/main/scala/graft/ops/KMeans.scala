package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column, hand-rolled on DataFrame
  * ops so every step is deterministic and DuckDB-oracle-checkable
  * (MLlib's KMeans seeds with k-means|| sampling and reports
  * run-dependent cluster ids, so its raw output can't be pinned
  * cross-engine).
  *
  * Scale shape: centroids are driver-side state (k×d doubles — the same
  * sketch-sized state MLlib's KMeans keeps between iterations), inlined
  * into the assignment expression as literals. ASSIGNMENT is therefore
  * shuffle-free — one scan computes the argmin over k inlined centroid
  * vectors per row, no N×k crossJoin, no exchange. The only shuffle per
  * iteration is the centroid UPDATE: a (cluster, dim) grouped mean —
  * k·d groups with map-side partial aggregation, so the exchange
  * carries O(partitions · k · d) rows regardless of N. Per iteration at
  * 100 TB: one full scan + one tiny agg; the k×d collect is
  * sketch-sized, never O(N).
  *
  * Determinism (cross-engine, the q129/q146 bounds convention):
  *  - float inputs are cast to double before any arithmetic;
  *  - the argmin orders by round(L2 distance, 6dp) with ties broken by
  *    the LOWEST centroid index (struct ordering on (dist, idx)), so an
  *    engine-side 1-ulp summation difference can't flip an assignment
  *    unless two rounded distances collide exactly — in which case both
  *    engines agree on the tie-break;
  *  - updated centroid means are rounded to 6dp each round, re-pinning
  *    both engines to identical centroids before the next assignment;
  *  - seeding is the k lowest-id vectors (no RNG);
  *  - a cluster that goes empty keeps its previous centroid.
  */
object KMeans {

  /** Run `iters` Lloyd iterations; returns the final assignment frame
    * (`id`, `cluster`) plus the final centroids (for callers that score
    * against them). */
  def lloyd(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, Seq[Seq[Double]]) = {
    require(k > 0, s"k must be > 0, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val v = emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
    val seed = v.orderBy(col("id")).limit(k).collect()
    require(seed.length == k, s"need at least $k vectors to seed, got ${seed.length}")
    var cents: Seq[Seq[Double]] = seed.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    for (_ <- 1 to iters) {
      val upd = assign(v, cents)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("x")), 6).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq
        }
      cents = cents.indices.map(i => upd.getOrElse(i, cents(i)))
    }
    (assign(v, cents).select(col("id"), col("cluster")), cents)
  }

  /** Shuffle-free nearest-centroid assignment: argmin over k inlined
    * centroid literals via array_min on (rounded distance, index)
    * structs — struct ordering IS the (dist ASC, idx ASC) tie rule. */
  private def assign(v: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    val cand = cents.zipWithIndex.map { case (c, i) =>
      val d2 = aggregate(
        zip_with(col("v"), typedLit(c), (a, b) => (a - b) * (a - b)),
        lit(0d), (acc, x) => acc + x)
      struct(round(sqrt(d2), 6).as("d"), lit(i).as("i"))
    }
    v.withColumn("cluster", array_min(array(cand: _*)).getField("i"))
  }

  /** The DuckDB-SQL twin of [[lloyd]] + final assignment, unrolled
    * iteration by iteration (CTE chain `c0 → a1 → u1 → c1 → … → afin`),
    * over `embeddings(vec_id, embedding)`. Exposed so the oracle and
    * any dependent query build from one generator instead of a
    * hand-maintained copy. */
  def oracleCtes(k: Int, iters: Int): String = {
    def assignCte(name: String, cents: String) =
      s""" $name AS (SELECT vec_id, cidx AS cluster FROM (
         |  SELECT e.vec_id, c.cidx,
         |         row_number() OVER (PARTITION BY e.vec_id
         |            ORDER BY round(list_distance(e.v, c.v), 6), c.cidx) AS rn
         |  FROM e CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    val head =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cidx, v
         |        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k))""".stripMargin
    val iterations = (1 to iters).flatMap { it =>
      Seq(
        assignCte(s"a$it", s"c${it - 1}"),
        s""" u$it AS (SELECT cidx, list(m ORDER BY pos) AS v FROM (
           |  SELECT a.cluster AS cidx, ux.pos, round(avg(ux.x), 6) AS m
           |  FROM (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e) ux
           |  JOIN a$it a USING (vec_id) GROUP BY 1, 2) GROUP BY 1)""".stripMargin,
        s""" c$it AS (SELECT p.cidx, COALESCE(u.v, p.v) AS v
           |  FROM c${it - 1} p LEFT JOIN u$it u USING (cidx))""".stripMargin)
    }
    (head +: iterations :+ assignCte("afin", s"c$iters")).mkString(",\n")
  }
}
