package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
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
    val v = normalize(emb, idCol, vecCol)
    var cents = seedCents(v, k)
    for (_ <- 1 to iters)
      cents = updatedCents(assign(v, cents), cents)
    (assign(v, cents).select(col("id"), col("cluster")), cents)
  }

  /** [[lloyd]] for corpus-scaled k (SemDeDup's prescription — see
    * [[scaledK]]) — every iteration and the final pass assign through
    * [[assignScan]]: ONE scan per pass, centroids riding the task
    * closure as k×d primitive doubles, argmin in a tight loop per row.
    * The three assignment faces (inline-literal [[assign]],
    * broadcast-join [[assignJoin]], closure-scan [[assignScan]]) share
    * the determinism contract (double cast, 6dp-rounded distance, ties
    * to the lowest index, 6dp-rounded centroid means, lowest-id
    * seeding), so for any (k, iters) they return IDENTICAL centroids
    * and assignments (pinned in KMeansSpec) and
    * [[oracleCtes]]/[[oracleCtesScaledK]] describe all of them.
    *
    * Why the scan face: the inline face's k×d expression literals hit
    * codegen/plan-size ceilings at O(100s) of centroids, and the
    * broadcast-join face — while shuffle-bounded — MATERIALIZES N×k
    * intermediate rows per pass, each paying interpreted higher-order-
    * function evaluation (zip_with + aggregate are not whole-stage-
    * codegen'd) plus ObjectHashAggregate row handling. At the r18 10×
    * rehearsal (N = 20k, scaled k = 200, 4 passes = 16M joined rows)
    * that shape read 74× sf0.1's time; the closure scan does the same
    * k·d flops per row with NO intermediate rows and NO aggregate,
    * restoring ~linear scaling. Per iteration the only exchange left is
    * the (cluster, dim) centroid-update aggregate, k·d groups. */
  def lloydJoin(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, Seq[Seq[Double]]) = {
    require(k > 0, s"k must be > 0, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // iterative-access cache (the S2 exception family): each iteration
    // re-reads v (argmin input carrying the vectors for the update), so
    // the loop would otherwise re-scan and re-cast the corpus per
    // round. Released before returning — the final assignment pays one
    // uncached scan rather than leaking cache into the caller's
    // session.
    val v = normalize(emb, idCol, vecCol).cache()
    try {
      var cents = seedCents(v, k)
      // assignScanV keeps the vector column, so the centroid update
      // reads it directly — no id-join rebind pass at all
      for (_ <- 1 to iters)
        cents = updatedCents(assignScanV(v, cents), cents)
      (assignScanV(normalize(emb, idCol, vecCol), cents).select(col("id"), col("cluster")),
        cents)
    } finally {
      v.unpersist(blocking = false): Unit
    }
  }

  /** Closure-scan nearest-centroid assignment — the LARGE-k production
    * face: (id, cluster, d) in one pass, no join, no aggregate, no N×k
    * intermediates (rationale on [[lloydJoin]]). Centroids ship once
    * per task as primitive arrays; per row the argmin loop replays
    * EXACTLY the join face's arithmetic — squared diffs summed in dim
    * order (bit-identical IEEE), sqrt, then the same
    * BigDecimal-HALF_UP 6dp round Spark's `round()` applies, ties to
    * the lowest centroid index — so all faces and the SQL oracle agree
    * on every assignment (pinned in KMeansSpec). */
  def assignScan(emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame =
    assignScanV(normalize(emb, idCol, vecCol), cents)
      .select(col("id"), col("cluster"), col("d"))

  private def assignScanV(v: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame = {
    require(cents.nonEmpty, "assignScan needs at least one centroid")
    val cs: Array[Array[Double]] = cents.map(_.toArray).toArray
    val pick = udf { (vec: Seq[Double]) =>
      val x = vec.toArray
      // pass 1 — unrounded min squared distance, pure flops. The exact
      // contract rounds each distance (BigDecimal via Double.toString —
      // the Catalyst Round semantics) BEFORE comparing, but rounding is
      // monotone non-decreasing, so the winning ROUNDED value is
      // round6(sqrt(sMin)), and any centroid tying it must satisfy
      // sqrt(s_i) <= sqrt(sMin) + 1e-6 (each side sits within 0.5e-6 of
      // the shared grid point). Restricting the BigDecimal work to that
      // band is therefore EXACT — and drops the per-row
      // Double.toString+BigDecimal count from k to ~1 (measured on the
      // r18 100x rehearsal: q203 814s -> the flop-bound cost; the
      // all-centroid rounding was 490x super-linear).
      var sMin = Double.PositiveInfinity
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        var s = 0.0
        var j = 0
        while (j < x.length) { val t = x(j) - c(j); s += t * t; j += 1 }
        if (s < sMin) sMin = s
        i += 1
      }
      // pass 2 — original rounded-argmin semantics over the ambiguity
      // band only (threshold slightly generous against float error in
      // T itself: out-of-band centroids round strictly above the
      // winning value, so extras can only lose, never win)
      val tBound = math.sqrt(sMin) + 1.000001e-6
      val t2 = tBound * tBound
      var bi = 0
      var bd = Double.PositiveInfinity
      i = 0
      while (i < cs.length) {
        val c = cs(i)
        var s = 0.0
        var j = 0
        while (j < x.length) { val t = x(j) - c(j); s += t * t; j += 1 }
        if (s <= t2) {
          val d = BigDecimal(math.sqrt(s))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (d < bd) { bd = d; bi = i }
        }
        i += 1
      }
      (bi, bd)
    }
    v.select(col("id"), col("v"), pick(col("v")).as("r"))
      .select(col("id"), col("v"), col("r").getField("_1").as("cluster"),
        col("r").getField("_2").as("d"))
  }

  /** SemDeDup-style corpus-scaled cluster count: k = max(kmin,
    * ⌈n/divisor⌉), integer arithmetic. The clustering's whole job is to
    * keep per-cluster pair blocks bounded as the corpus grows, so k
    * must grow WITH n — a pinned k makes block sizes Θ(n/k) and the
    * pair volume quadratic again. n comes from a 1-row count — k is
    * plan state, driver-sized by definition, like a schema. */
  def scaledK(n: Long, divisor: Long = 100L, kmin: Int = 10): Int = {
    require(divisor > 0 && kmin > 0, s"divisor/kmin must be > 0, got $divisor/$kmin")
    val k = math.max(kmin.toLong, (n + divisor - 1) / divisor)
    // fail loudly instead of letting .toInt wrap: a k past Int range
    // means the divisor is mis-sized for the corpus, not a real ask
    require(k <= Int.MaxValue,
      s"scaledK: k=$k exceeds Int range - raise divisor (n=$n, divisor=$divisor)")
    k.toInt
  }

  private def normalize(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))

  /** Lowest-id seeding (no RNG) — k rows, driver-sized. */
  private def seedCents(v: DataFrame, k: Int): IndexedSeq[Seq[Double]] = {
    val seed = v.orderBy(col("id")).limit(k).collect()
    require(seed.length == k, s"need at least $k vectors to seed, got ${seed.length}")
    seed.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
  }

  /** One centroid update from an assignment frame carrying (cluster, v):
    * (cluster, dim)-grouped 6dp-rounded means — k·d groups with
    * map-side combine, so the exchange and the collect are sketch-sized
    * regardless of N. Empty clusters keep their previous centroid. */
  private def updatedCents(withVec: DataFrame,
      cents: IndexedSeq[Seq[Double]]): IndexedSeq[Seq[Double]] = {
    val upd = withVec
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq
      }
    cents.indices.map(i => upd.getOrElse(i, cents(i)))
  }

  /** Broadcast-join nearest-centroid assignment — the LARGE-k production
    * face of [[assign]]. [[assign]] inlines k×d centroid doubles as
    * expression literals, which is the right trick for a shuffle-free
    * oracle-checkable k=10 but structurally caps k at O(100s) (codegen
    * method limits, plan size); SemDeDup's own prescription scales k
    * with the corpus (tens of thousands of clusters). Here centroids
    * ride a BROADCAST DataFrame — k×d is DATA shipped once per
    * executor, not expression text — so k scales until k·d stops
    * fitting in a broadcast (~10⁷ doubles), with per-row cost the same
    * brute-force k·d argmin either way.
    *
    * Plan shape: broadcast join — BroadcastNestedLoopJoin BuildRight,
    * the only correct broadcast form for a KEYLESS row×all-centroids
    * pairing (there is no equi-key for a hash join to dispatch on;
    * each input partition needs every centroid) — then a per-id argmin
    * aggregate with map-side partial combine, so the one exchange
    * carries ≤ N pre-combined rows, never N×k. That single shuffle is
    * the price of the join form vs [[assign]]'s pure scan — the right
    * trade exactly when k is too large to inline. The argmin is the
    * [[ArgMin]] typed Aggregator, NOT `min_by(cidx, struct(d, cidx))`:
    * min_by's struct-typed ordering buffer is not hash-aggregable and
    * falls back to SortAggregate, which would sort the N×k joined
    * frame by id; the Aggregator plans hash-based ObjectHashAggregate
    * (partial + final), no sort anywhere (pinned in ScaleSpec).
    *
    * Determinism contract is IDENTICAL to [[assign]] (double cast,
    * 6dp-rounded distance, ties to the lowest centroid index), so for
    * any centroid set the two faces return the same assignment frame
    * and [[oracleCtes]] describes both (pinned in KMeansSpec).
    */
  def assignJoin(emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame =
    assignJoinV(normalize(emb, idCol, vecCol), cents)

  /** [[assignJoin]] over an already-normalized (id, v double[]) frame —
    * the shared body [[lloydJoin]]'s iterations reuse. */
  private def assignJoinV(v: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame =
    assignJoinDistV(v, cents).drop("d")

  /** [[assignJoin]] KEEPING the assigned distance: (id, cluster, d)
    * with d the 6dp-rounded L2 distance to the chosen centroid. The
    * distance rides the SAME single aggregate — `min(d)` alongside the
    * argmin is exactly the chosen cluster's distance (ties share their
    * rounded d by construction), so drift gating costs no extra pass.
    * The [[graft.ops.IvfState]] incremental-assignment path reads this
    * face. */
  def assignJoinWithDist(emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]]): DataFrame =
    assignJoinDistV(normalize(emb, idCol, vecCol), cents)

  private def assignJoinDistV(v: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame = {
    require(cents.nonEmpty, "assignJoin needs at least one centroid")
    val spark = v.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cidx", "cv")
    val d2 = aggregate(
      zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0d), (acc, x) => acc + x)
    val argmin = udaf(new ArgMin)
    v.join(broadcast(cdf))
      .select(col("id"), col("cidx"), round(sqrt(d2), 6).as("d"))
      .groupBy(col("id"))
      .agg(argmin(col("d"), col("cidx")).as("cluster"), min(col("d")).as("d"))
  }

  /** Per-group argmin as a mergeable typed Aggregator: one (dist, cidx)
    * pair of state, ordered (dist ASC, cidx ASC) — exactly [[assign]]'s
    * struct-ordering tie rule. Distances arrive 6dp-rounded and
    * non-NaN (sqrt of a sum of squares over cast doubles), so plain
    * `<` comparison is total here. */
  private class ArgMin extends Aggregator[(Double, Int), (Double, Int), Int] {
    override def zero: (Double, Int) = (Double.PositiveInfinity, Int.MaxValue)
    override def reduce(b: (Double, Int), a: (Double, Int)): (Double, Int) =
      if (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) a else b
    override def merge(a: (Double, Int), b: (Double, Int)): (Double, Int) =
      reduce(a, b)
    override def finish(b: (Double, Int)): Int = b._2
    override def bufferEncoder: Encoder[(Double, Int)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaInt)
    override def outputEncoder: Encoder[Int] = Encoders.scalaInt
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
    * hand-maintained copy. `eWhere` filters the fit corpus (the
    * incremental-IVF oracle fits on a history slice, then assigns the
    * new batch against the same `c<iters>` centroids CTE). */
  def oracleCtes(k: Int, iters: Int, eWhere: String = "TRUE"): String =
    ctesWithSeed(
      s""" c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cidx, v
         |        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k))""".stripMargin,
      iters, eWhere)

  /** [[oracleCtes]] with the k of [[scaledK]] computed IN SQL from the
    * corpus itself (one `kk` scalar CTE, integer ceil-div), so one
    * oracle string is correct at every SF — the seed CTE takes the
    * k lowest-id vectors via a rank filter instead of a literal LIMIT.
    * Only the seeding depends on k; the iteration CTEs are k-free. */
  def oracleCtesScaledK(kmin: Int, divisor: Int, iters: Int): String =
    ctesWithSeed(
      s""" kk AS (SELECT greatest($kmin, (count(*) + ${divisor - 1}) // $divisor) AS k
         |        FROM e),
         | c0 AS (SELECT rn - 1 AS cidx, v FROM (
         |        SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
         |        WHERE rn <= (SELECT k FROM kk))""".stripMargin,
      iters)

  private def ctesWithSeed(seedCte: String, iters: Int,
      eWhere: String = "TRUE"): String = {
    def assignCte(name: String, cents: String) =
      s""" $name AS (SELECT vec_id, cidx AS cluster FROM (
         |  SELECT e.vec_id, c.cidx,
         |         row_number() OVER (PARTITION BY e.vec_id
         |            ORDER BY round(list_distance(e.v, c.v), 6), c.cidx) AS rn
         |  FROM e CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    val head =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |           WHERE $eWhere),
         |$seedCte""".stripMargin
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
