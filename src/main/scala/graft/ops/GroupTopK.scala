package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
  * Ties break id-DESC to match the reference's Python tuple sort.
  */
class GroupTopK(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  /** (score, id) strictly greater in (score DESC, id DESC) order. */
  @inline private def beats(s: Double, id: Long, os: Double, oid: Long): Boolean =
    s > os || (s == os && id > oid)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], row: (Double, Long)): Array[(Double, Long)] = {
    val (s, id) = row
    val n = buf.length
    if (n == k && !beats(s, id, buf(n - 1)._1, buf(n - 1)._2)) return buf
    // position of the first element this row beats (insertion point)
    var i = 0
    while (i < n && !beats(s, id, buf(i)._1, buf(i)._2)) i += 1
    val out = new Array[(Double, Long)](math.min(n + 1, k))
    System.arraycopy(buf, 0, out, 0, i)
    out(i) = row
    System.arraycopy(buf, i, out, i + 1, out.length - i - 1)
    out
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
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

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
}
