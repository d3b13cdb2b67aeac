package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless interval join at scale (SURVEY "custom operators" option (a):
  * compose existing ops). Spark plans `points JOIN intervals ON p BETWEEN
  * lo AND hi` — no equi key — as a broadcast nested-loop join, which dies
  * the moment the interval side outgrows the broadcast threshold, and as
  * a cartesian product after that. The standard fix (the one Databricks
  * ships as its range-join optimization, re-expressed here with public
  * operators only) is binning: quantize the domain into fixed-width bins,
  * explode each interval onto every bin it overlaps, tag each point with
  * its single containing bin, and equi-join on the bin with the exact
  * BETWEEN as a residual predicate.
  *
  * Why this is the 100 TB shape: the join becomes a plain shuffled
  * equi-join — both sides hash-partition on the bin, AQE sees a normal
  * exchange, no broadcast requirement, no N×M pair enumeration. Work is
  * |points| + |intervals|·(span/binWidth) exploded rows; pick binWidth
  * near the TYPICAL interval span so the explode factor stays ~2 and each
  * bin's candidate block stays small. A point's bin is unique, so every
  * qualifying (point, interval) pair meets in EXACTLY one bin — no
  * post-join dedup, the classic correctness trap of bin overlap schemes.
  *
  * Both bound columns must be numeric (cast dates to a day number via
  * `datediff` first); inclusive on both ends, matching SQL BETWEEN.
  */
object RangeJoin {

  /** Floor division in EXACT long arithmetic: `floor(c / w)` via double
    * division silently mis-bins values beyond 2^53 (epoch-nanos
    * timestamps are ~2^60), and Spark's long `/` is double-backed too.
    * `(c - pmod(c, w)) div w` stays integral end to end: the pmod shift
    * makes the numerator an exact multiple, so truncating IntegralDivide
    * IS floor division, negatives included. */
  private[ops] def floorDiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val shifted = c.cast("long") - pmod(c.cast("long"), lit(w))
    GraftSqlBridge.column(IntegralDivide(
      GraftSqlBridge.expr(shifted), GraftSqlBridge.expr(lit(w)))).cast("long")
  }

  /** All (point, interval) pairs with `start <= point <= end`, as the
    * two frames' columns side by side — the keyless analogue of
    * `points.join(intervals, point.between(start, end))` with a
    * shuffled equi-join plan instead of a broadcast NLJ. Intervals with
    * `end < start` match nothing and are dropped before the explode
    * (sequence() would otherwise walk them DESCENDING and emit bins). */
  def pointInInterval(points: DataFrame, point: Column,
      intervals: DataFrame, start: Column, end: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // collision-free working column across BOTH schemas
    val taken = (points.columns ++ intervals.columns).toSet
    val bin = Iterator.from(0).map(i => if (i == 0) "_bin" else s"_bin$i")
      .dropWhile(taken.contains).next()
    def binOf(c: Column): Column = floorDiv(c, binWidth)
    val p = points.withColumn(bin, binOf(point))
    val iv = intervals
      .filter(start <= end)
      .withColumn(bin, explode(sequence(binOf(start), binOf(end))))
    p.join(iv, p(bin) === iv(bin) && point >= start && point <= end)
      .drop(bin)
  }

  /** All (a, b) interval pairs that OVERLAP (`aLo <= bHi && bLo <= aHi`,
    * closed intervals) — the keyless session-concurrency /
    * reservation-conflict join, same binning scheme. The exactly-once
    * trick differs from [[pointInInterval]]: two overlapping intervals
    * share EVERY bin their intersection touches, so emitting on plain
    * bin equality would duplicate pairs. Each pair is emitted only in
    * the FIRST bin of its intersection — `bin == floor(max(aLo, bLo) /
    * width)` — a bin both sides cover by definition, so exactly one
    * surviving row per qualifying pair, no post-join dedup (a distinct
    * over the pair frame would be a second corpus-wide shuffle).
    * Column names must be disjoint across the two frames. */
  def intervalOverlap(a: DataFrame, aLo: Column, aHi: Column,
      b: DataFrame, bLo: Column, bHi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // enforce the documented disjointness, mirroring the binWidth
    // check: an overlap (easy to hit in a self-join whose caller
    // forgot to re-alias) otherwise surfaces as an ambiguous-reference
    // analysis error — or silently mis-resolved bound columns
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"column names must be disjoint across the two frames; shared: ${shared.mkString(", ")}")
    val taken = (a.columns ++ b.columns).toSet
    val bin = Iterator.from(0).map(i => if (i == 0) "_bin" else s"_bin$i")
      .dropWhile(taken.contains).next()
    def binOf(c: Column): Column = floorDiv(c, binWidth)
    val ae = a.filter(aLo <= aHi)
      .withColumn(bin, explode(sequence(binOf(aLo), binOf(aHi))))
    val be = b.filter(bLo <= bHi)
      .withColumn(bin, explode(sequence(binOf(bLo), binOf(bHi))))
    ae.join(be,
        ae(bin) === be(bin) && aLo <= bHi && bLo <= aHi &&
          ae(bin) === binOf(greatest(aLo, bLo)))
      .drop(bin)
  }
}
