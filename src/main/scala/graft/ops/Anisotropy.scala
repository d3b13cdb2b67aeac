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

  /** The (i, j, v) integer state for one batch of embeddings, computed
    * by ONE pass of the typed [[GramAggregator]]: each task folds its
    * rows into a single Array[Long] buffer (d(d+1)/2 Gram slots + d
    * sums + count + the dim tag), partials merge elementwise, and the
    * driver decodes the one k-bounded result array into state rows —
    * no per-row d² fan-out ever materializes (the first formulation
    * exploded N·d² product rows through a hash aggregate; the
    * aggregator form removed that 4096×-row blow-up and measured
    * 10.4 → 1.66s at the 100× corpus, identical integer state). */
  def gramState(embeddings: DataFrame, embCol: Column): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val arr = embeddings
      .select(embCol.as("e"))
      .select(expr("transform(e, x -> " +
        "cast(floor(cast(x as double) * 1000000.0) as bigint))").as("q"))
      .as[Array[Long]]
      .select(new GramAggregator().toColumn.name("b"))
      .head()
    if (arr.isEmpty) return Seq.empty[(Int, Int, Long)].toDF("i", "j", "v")
    val d = arr(0).toInt
    val rows = scala.collection.mutable.ArrayBuffer[(Int, Int, Long)]()
    rows += ((-1, -1, arr(1)))
    (0 until d).foreach(i => rows += ((i, -1, arr(2 + i))))
    var idx = 2 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { rows += ((i, j, arr(idx))); idx += 1; j += 1 }
      i += 1
    }
    rows.toSeq.toDF("i", "j", "v")
  }

  /** Merge Gram states — exact-long sums on the d²-bounded key. */
  def mergeGramState(states: Seq[DataFrame]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(col("i"), col("j")).agg(sum(col("v")).as("v"))

  /** Distributive Gram/sum/count sketch over quantized embedding
    * arrays (the MinHashSignature discipline applied to linear
    * algebra): buffer layout [d, count, s_0..s_{d−1}, upper-triangle
    * Gram row-major]. All slots exact longs; ragged input dims are a
    * hard error, not a silent misalignment. */
  class GramAggregator
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      val d = a.length
      val buf =
        if (b.isEmpty) { val nb = new Array[Long](2 + d + d * (d + 1) / 2)
          nb(0) = d.toLong; nb }
        else { require(b(0) == d.toLong,
          s"ragged embedding dims: ${b(0)} vs $d"); b }
      buf(1) += 1L
      var i = 0
      var idx = 2 + d
      while (i < d) {
        buf(2 + i) += a(i)
        var j = i
        while (j < d) { buf(idx) += a(i) * a(j); idx += 1; j += 1 }
        i += 1
      }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        require(x(0) == y(0), s"ragged partials: ${x(0)} vs ${y(0)}")
        var i = 1
        while (i < x.length) { x(i) += y(i); i += 1 }
        x
      }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

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
    // Empty state (gramState of an empty frame, or a stream read
    // before the first micro-batch) reads as an empty result, matching
    // gramState's own empty-input handling — not a missing-key crash.
    if (rows.isEmpty)
      return Seq.empty[(Long, Double, Double, Double, Option[Double])]
        .toDF("dim", "loading", "lambda1", "trace", "anisotropy")
    val n = rows((-1, -1)).toDouble
    val sums = rows.collect { case ((i, -1), v) if i >= 0 => i -> v }
    val dim = sums.size
    val sArr = Array.tabulate(dim)(i => sums(i).toDouble)
    val (v, l1, tr) =
      topEigen(dim, n, sArr, (lo, hi) => rows((lo, hi)))
    (0 until dim).map(i => (i.toLong, r6(v(i)), r6(l1), r6(tr),
        if (tr > 0) Some(r6(l1 / tr)) else None))
      .toDF("dim", "loading", "lambda1", "trace", "anisotropy")
      .orderBy(col("dim"))
  }

  /** (count, λ1, trace) from one [[GramAggregator]] buffer — the
    * per-group read behind the by-label face (q342). */
  def summaryFromBuffer(buf: Array[Long]): (Long, Double, Double) = {
    require(buf.nonEmpty, "empty Gram buffer")
    val dim = buf(0).toInt
    val n = buf(1).toDouble
    val sArr = Array.tabulate(dim)(i => buf(2 + i).toDouble)
    def gram(lo: Int, hi: Int): Long =
      buf(2 + dim + lo * (2 * dim - lo + 1) / 2 + (hi - lo))
    val (_, l1, tr) = topEigen(dim, n, sArr, gram)
    (buf(1), l1, tr)
  }

  private[graft] def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The fixed double program (identical IEEE sequence to the oracle's
    * recursive-CTE replay): covariance from the exact integers, 20
    * power-iteration rounds from the uniform start, Rayleigh quotient
    * + trace — every fold in ascending index order. */
  private def topEigen(dim: Int, n: Double, sArr: Array[Double],
      gram: (Int, Int) => Long): (Array[Double], Double, Double) = {
    require(dim > 0 && dim <= 256,
      s"driver-side eigen solve needs bounded dim, got $dim")
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      (gram(lo, hi).toDouble - sArr(lo) * sArr(hi) / n) / n
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
    (v, l1, tr)
  }
}
