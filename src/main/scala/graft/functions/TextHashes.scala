package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen twins of the dedup queries' exploded formulations.
  * Each computes, per input row, exactly the value the relational
  * formulation aggregates to — same integer math, same hash — so the
  * DuckDB oracles are unchanged while the Spark plan loses a generate +
  * two aggregate exchanges per query.
  *
  * The static helpers live in [[TextHashOps]] (NOT the case-class
  * companions): scalac suppresses the static forwarder for a companion
  * method whose name collides with an inherited class member, and both
  * expressions inherit `eval(InternalRow)` — a companion `eval` would
  * compile but leave the generated `graft.functions.X.eval(...)` call
  * unresolvable at Janino time, silently de-optimizing every enclosing
  * whole-stage to interpreted eval.
  *
  * Perf note (settles the round-5 q37/q38 regression question): this
  * refactor was NOT the cause. Re-benched in isolation after the q36
  * plan fix, q37 runs 0.38-0.68s and q38 1.1-2.4s at sf0.1 (min-of-3
  * and single-shot runs alike, vs 4.9s/7.4s in the round-5 suite), and
  * q37's physical plan is a single scan→project with simhash32 inline.
  * The round-5 numbers were session-wide churn from q36's 54.6s
  * runaway shuffle earlier in the same suite run.
  */
object TextHashOps {

  /** min over i in 1..max(len-7,1) of p60(substring(s, i, 8)) — the
    * winnowing rolling fingerprint of q33, without materializing the
    * 8-gram array. */
  def rollingMin60(s: UTF8String): Long = {
    val end = math.max(s.numChars() - 7, 1)
    var m = Long.MaxValue
    var i = 1
    while (i <= end) {
      val h = Portable60.hash60(s.substringSQL(i, 8))
      if (h < m) m = h
      i += 1
    }
    m
  }

  /** 32-bit SimHash over a token array: per token occurrence, bit j of
    * p60(token) % 2^32 contributes +1/-1 to counter j; fingerprint sets
    * bit j iff counter j > 0. Identical to q37's explode + two-groupBy
    * formulation, evaluated in one pass per document. */
  def simHash32(tokens: ArrayData): Long = {
    val v = new Array[Int](32)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        val h = Portable60.hash60(tok) % 4294967296L
        var j = 0
        while (j < 32) {
          if (((h >>> j) & 1L) == 1L) v(j) += 1 else v(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { if (v(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Salt suffix for the high-half token hash of [[simHash64]]. */
  private val HiSalt = UTF8String.fromString("#")

  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles of a token array, first-occurrence
    * order — the one-pass twin of
    * `array_distinct(transform(sequence(0, size(w)-n), i ->
    * concat_ws(' ', w[i], ..., w[i+n-1])))`, which Spark evaluates as an
    * INTERPRETED lambda chain per row (higher-order functions don't
    * participate in whole-stage codegen). This projection fronts every
    * shingle-family query (jaccard/minhash/LSH/components), so the
    * interpreter overhead multiplies across the suite's hottest ops.
    * Exact concat_ws semantics: null tokens are skipped inside a gram
    * (split() never yields nulls, but the contract is preserved). */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + n <= m) {
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        if (t != null) parts.add(t)
        j += 1
      }
      out.add(UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](0)): _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** 64-bit SimHash — [[simHash32]] widened to 64 counters. The 64 bits
    * of per-token signal are two independent portable 32-bit hashes
    * zipped together: bits 0-31 from p60(token) % 2^32 (exactly the
    * [[simHash32]] hash) and bits 32-63 from p60(token || '#') % 2^32 (a
    * salted second draw) — both DuckDB-expressible, so the wide
    * fingerprint is oracle-checkable end-to-end (q100), unlike the
    * earlier splitmix64 construction whose mix constants lived JVM-side
    * only. The scale variant: 8 byte-bands instead of 4 keep the same
    * pigeonhole guarantee (hamming <= fpBytes-1 pairs always share a
    * band) while each band carries 8 signal bits of a 64-bit space, so
    * in-bucket pair fan-out at a given corpus size drops ~2^32-fold vs
    * banding a 32-bit fingerprint. */
  def simHash64(tokens: ArrayData): Long = {
    val v = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      if (tok != null) {
        val lo = Portable60.hash60(tok) % 4294967296L
        val hi = Portable60.hash60(UTF8String.concat(tok, HiSalt)) % 4294967296L
        val h = lo | (hi << 32)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) v(j) += 1 else v(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (v(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): the
    * DISTINCT w-window minima of the per-position p60 k-gram hashes,
    * first-occurrence order — the one-pass twin of
    *   array_distinct(transform(sequence(1, greatest(nH - w + 1, 1)),
    *     j -> array_min(slice(hs, j, w))))
    * over hs = transform(sequence(1, greatest(len - k + 1, 1)),
    *     i -> p60(substring(s, i, k))).
    * The composed-HOF form is quadratic IN PRACTICE, not just
    * interpreted: CollapseProject inlines the hs-building transform
    * into the outer lambda, so every window slice re-evaluates the
    * whole k-gram hash array — O(len²) md5 calls per document (the
    * q318 probe measured 483s at sf0.01 vs ~2s for this form). Here:
    * one O(len) hash pass, then a monotonic-deque sliding minimum
    * (amortized O(1) per window). Tail windows clamp exactly like the
    * oracle's list slice: for nH < w there is a single window over all
    * nH hashes; otherwise every window is full width. */
  def winnow60(s: UTF8String, k: Int, w: Int): ArrayData = {
    val nH = math.max(s.numChars() - (k - 1), 1)
    val hs = new Array[Long](nH)
    var i = 0
    while (i < nH) { hs(i) = Portable60.hash60(s.substringSQL(i + 1, k)); i += 1 }
    val nWin = math.max(nH - (w - 1), 1)
    val out = new java.util.LinkedHashSet[java.lang.Long]
    // deque of indices with increasing hash value; front = window min.
    // Ties keep the EARLIER index (strict < when popping), matching
    // array_min over the slice — the min VALUE is identical either way.
    val dq = new Array[Int](nH)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < nH) {
      while (tail > head && hs(dq(tail - 1)) > hs(j)) tail -= 1
      dq(tail) = j
      tail += 1
      val winStart = j - (w - 1)
      while (dq(head) < winStart) head += 1
      // window ending at j corresponds to start index max(winStart, 0);
      // emit once per start in 0..nWin-1 — i.e. whenever j >= w-1, plus
      // the single clamped window when nH < w (emitted at j = nH-1)
      if (j >= w - 1 || j == nH - 1) out.add(hs(dq(head)))
      j += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next().longValue(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(input: Any): Any =
    TextHashOps.wordShingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RollingMin60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "p60_rolling8_min"
  override def nullSafeEval(input: Any): Any =
    TextHashOps.rollingMin60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.rollingMin60($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Winnow60(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow60"
  override def nullSafeEval(input: Any): Any =
    TextHashOps.winnow60(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.winnow60($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def nullSafeEval(input: Any): Any =
    TextHashOps.simHash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.simHash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextHashOps.simHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashOps.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
