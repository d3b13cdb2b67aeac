package graft.ops

import scala.reflect.ClassTag

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded-heap per-key top-k as a mergeable typed Aggregator — the
  * scale-correct alternative to the `row_number().over(Window)` top-k
  * (SURVEY §2.5 T1, reference tie order score DESC then id DESC).
  *
  * Why this exists when q04 already answers the same question: the
  * window form shuffles EVERY row to its key's reducer and sorts whole
  * partitions before discarding all but k rows — on a 100 TB fact table
  * the exchange carries the full table and a single hot key (one
  * customer with billions of orders) becomes a straggler sort. This
  * Aggregator is algebraic: map-side partial aggregation folds each
  * input partition down to at most k (score, id) pairs per key before
  * the exchange, so the shuffle carries ≤ k rows per key per map task
  * regardless of skew, and no sort ever sees more than k·(merge fan-in)
  * elements. Same answer, bounded intermediate state — the per-key
  * analogue of what TakeOrderedAndProject does for global top-k.
  *
  * The buffer is a descending-sorted array of at most k pairs (k is
  * pipeline-small: 3..100), so insertion is a linear scan over ≤ k
  * elements — cheaper than heap bookkeeping at these sizes and it keeps
  * the buffer encodable as a plain array<struct<score,id>> (no kryo).
  *
  * Generic in the payload `T` (an id, a name, a whole struct) so the
  * same skew-proof top-k drops onto any keyed frame: ranking is always
  * score DESC; ties break by `idOrd`, LARGEST-under-the-ordering first.
  * Pass the natural `Ordering[Long]` for the reference's id-DESC tuple
  * sort (q105), `Ordering[Long].reverse` for an id-ASC tie like the
  * similarity rankings (q122). The implicit encoder for the buffer
  * resolves from `spark.implicits._` at the call site.
  */
class GroupTopK[T](k: Int)(implicit
    bufEnc: Encoder[Array[(Double, T)]],
    idOrd: Ordering[T],
    ct: ClassTag[(Double, T)])
    extends Aggregator[(Double, T), Array[(Double, T)], Array[(Double, T)]] {
  require(k > 0, s"k must be positive, got $k")

  /** (score, id) strictly greater in (score DESC, tie by idOrd-max-first)
    * order. Scores compare via Double.compare, a TOTAL order: NaN sorts
    * greater than everything — the same placement Spark's DESC sort
    * gives NaN — so NaN scores cannot diverge from the window
    * formulation (a naive `>` would leave NaN unordered and
    * merge-order-dependent). The `+ 0.0` collapses -0.0 to +0.0 first
    * (IEEE: -0.0 + 0.0 = +0.0, NaN preserved), matching SQL's
    * 0.0 = -0.0 equality where Double.compare would rank them. */
  @inline private def beats(s: Double, id: T, os: Double, oid: T): Boolean = {
    val c = java.lang.Double.compare(s + 0.0, os + 0.0)
    c > 0 || (c == 0 && idOrd.compare(id, oid) > 0)
  }

  override def zero: Array[(Double, T)] = Array.empty

  override def reduce(buf: Array[(Double, T)], row: (Double, T)): Array[(Double, T)] = {
    val (s, id) = row
    val n = buf.length
    if (n == k && !beats(s, id, buf(n - 1)._1, buf(n - 1)._2)) return buf
    // position of the first element this row beats (insertion point)
    var i = 0
    while (i < n && !beats(s, id, buf(i)._1, buf(i)._2)) i += 1
    val out = new Array[(Double, T)](math.min(n + 1, k))
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = row
    System.arraycopy(buf, i, out, i + 1, out.length - i - 1)
    out
  }

  override def merge(a: Array[(Double, T)], b: Array[(Double, T)]): Array[(Double, T)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, T)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && !beats(b(j)._1, b(j)._2, a(i)._1, a(i)._2))) {
          i += 1; a(i - 1)
        } else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Double, T)]): Array[(Double, T)] = buf

  override def bufferEncoder: Encoder[Array[(Double, T)]] = bufEnc
  override def outputEncoder: Encoder[Array[(Double, T)]] = bufEnc
}
