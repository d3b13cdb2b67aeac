package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space anisotropy from exact-integer Gram state — the
  * reusable core behind the q338 batch face and the streaming
  * collapse monitor (EventStreams.gramBatch / anisotropyCurrent).
  *
  * The sufficient statistic is one integer frame of rows
  * (i, j, v): the upper-triangle Gram sums (i ≤ j), the per-dim sums
  * as (i, −1) rows, and the vector count as (−1, −1) — embeddings
  * quantize to fixed-point longs (floor(x·1e6), the q84 declared-
  * quantization precedent), so every state entry is an exact long
  * (documented bound: exact while N·1e12 < 2⁶³, N < 9.2e6 vectors at
  * |x| ≤ 1) and state merges are plain integer sums. The read —
  * covariance, 20 power-iteration rounds from the uniform start,
  * Rayleigh quotient — is a fixed double program over those integers,
  * so the stream view equals the one-shot batch BYTE-identically (the
  * mixtureBatch argument) and the DuckDB oracle replays it as a
  * recursive list-carrying CTE. */
object Anisotropy {

  /** The (i, j, v) integer state for one batch of embeddings. The one
    * corpus-sized pass is the N·d² Gram fan-out into a d²/2-group
    * map-side-combining aggregate; sums and count ride the same
    * encoding so ONE frame is the whole state. */
  def gramState(embeddings: DataFrame, embCol: Column): DataFrame = {
    val q = embeddings
      .select(embCol.as("e"))
      .select(expr("transform(e, x -> " +
        "cast(floor(cast(x as double) * 1000000.0) as bigint))").as("q"))
      .localCheckpoint(true) // feeds count, dim sums and Gram cells
    val cells = q
      .select(posexplode(col("q")).as(Seq("i", "qi")), col("q").as("qv"))
      .select(col("i"), col("qi"), posexplode(col("qv")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j")).agg(sum(col("qi") * col("qj")).as("v"))
    val sums = q.select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i")).agg(sum(col("qi")).as("v"))
      .select(col("i"), lit(-1).as("j"), col("v"))
    val n = q.agg(count(lit(1)).as("v"))
      .select(lit(-1).as("i"), lit(-1).as("j"), col("v"))
    cells.select(col("i"), col("j"), col("v"))
      .unionByName(sums).unionByName(n)
  }

  /** Merge Gram states — exact-long sums on the d²-bounded key. */
  def mergeGramState(states: Seq[DataFrame]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(col("i"), col("j")).agg(sum(col("v")).as("v"))

  /** The q338 read: top covariance eigenvalue share + dominant-
    * direction loadings via 20 deterministic power-iteration rounds
    * (matvec/normalize folds all in ascending index order — the fixed
    * double program the oracle replays). Driver work is d²-bounded
    * (guarded d ≤ 256), the k-bounded-collect class. Returns
    * (dim, loading, lambda1, trace, anisotropy) ordered by dim. */
  def anisotropyFromState(state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    val rows = state.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val n = rows((-1, -1)).toDouble
    val sums = rows.collect { case ((i, -1), v) if i >= 0 => i -> v }
    val dim = sums.size
    require(dim > 0 && dim <= 256,
      s"driver-side eigen solve needs bounded dim, got $dim")
    val sArr = Array.tabulate(dim)(i => sums(i).toDouble)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      (rows((lo, hi)).toDouble - sArr(lo) * sArr(hi) / n) / n
    }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to 20) {
      val w = matvec(v)
      var nrm2 = 0.0; var i = 0
      while (i < dim) { nrm2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      v = w.map(_ / nrm)
    }
    val w = matvec(v)
    var l1 = 0.0; var tr = 0.0
    (0 until dim).foreach { i => l1 += v(i) * w(i); tr += c(i)(i) }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until dim).map(i => (i.toLong, r6(v(i)), r6(l1), r6(tr),
        if (tr > 0) Some(r6(l1 / tr)) else None))
      .toDF("dim", "loading", "lambda1", "trace", "anisotropy")
      .orderBy(col("dim"))
  }
}
