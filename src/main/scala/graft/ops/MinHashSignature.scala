package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed MinHash-signature aggregator (SURVEY §7.5: the north-star
  * dedup op as an `Aggregator`): folds pre-hashed shingle values into a
  * k-slot signature of permutation minima, mergeable across partitions —
  * i.e. a proper distributive sketch: map-side partial signatures merge
  * elementwise, so the shuffle carries k longs per document instead of
  * the full shingle set.
  *
  * Permutations match DedupQueries.q36 exactly
  * (h_i(x) = ((2i+3)*x + (5i+7)) mod 2^31-1), so the two formulations
  * cross-check each other (MinHashAggSpec) and share the DuckDB oracle.
  */
class MinHashSignature(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val P = Portable.MinHashPrime

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], hx: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = ((2L * i + 3L) * hx + (5L * i + 7L)) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
