package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

/** Misra–Gries frequent-items sketch as a typed `Aggregator`
  * (mergeable-summaries form: Agarwal et al., PODS 2012) — at most `k`
  * counters of fixed size whatever the stream length, with the classic
  * guarantee that any item of true frequency > n/(k+1) still holds a
  * counter at the end. Partial sketches merge associatively (sum
  * counters, then shave the (k+1)-th largest value off everything), so
  * the map-side combine ships ≤ k entries per partition — the whole
  * point at corpus scale, where the exact alternative is a groupBy
  * shuffling the full token vocabulary.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"sketch capacity must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      // full and x unseen: decrement every counter (x's +1 and the -1
      // cancel), dropping zeros — the O(k) step that amortizes to O(1)
      // per stream item because each decrement burns k+1 prior arrivals
      case None =>
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // shave the (k+1)-th largest counter value off every counter: ≤ k
      // survive, and each item loses at most what the error bound allows
      val vals = sum.valuesIterator.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(sum.size - k - 1)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {

  /** Exact heavy hitters — every item with count·(k+1) > n, with its
    * exact count — computed WITHOUT a full-vocabulary shuffle: pass 1
    * runs the sketch (fixed ≤ k-entry state per partition, merged on one
    * reducer), pass 2 recounts only the ≤ k sketch candidates via a
    * broadcast semi-join. The sketch's superset guarantee is what makes
    * the two-pass result exact, not approximate: no qualifying item can
    * be missing from the candidates, and the recount replaces estimated
    * counters with true counts. `items` is any single-column frame of
    * string items (tokens, shingles, domains). */
  def heavyHitters(items: DataFrame, itemCol: Column, k: Int): DataFrame = {
    val mg = udaf(new MisraGries(k))
    // drop nulls up front: a null item would become a Map key in the
    // sketch buffer and Catalyst's MapType forbids null keys (runtime
    // serialization error); and counting nulls in n_total while the
    // candidate join drops them would skew the threshold. Null is "no
    // item", uniformly, on both passes.
    val its = items.select(itemCol.cast("string").as("tk"))
      .filter(col("tk").isNotNull)
    // one pass computes BOTH the sketch and n: uncached `its` may sit on
    // an expensive upstream (explode-of-split tokenization), so a
    // separate count() would re-run that whole pipeline. n_total rides
    // along on each exploded candidate row — it's one long per ≤ k rows.
    val cand = its.agg(mg(col("tk")).as("sketch"), count(lit(1)).as("n_total"))
      .select(explode(map_keys(col("sketch"))).as("tk"), col("n_total"))
    its.join(broadcast(cand), "tk")
      .groupBy(col("tk"), col("n_total")).agg(count(lit(1)).as("cnt"))
      // exact integer threshold: cnt > n/(k+1) without a float in sight
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select(col("tk"), col("cnt"))
  }

  /** [[heavyHitters]] per group: every (group, item) whose count within
    * the group satisfies cnt·(k+1) > n_group, with its exact count —
    * same two-pass construction, with the sketch keyed on the group.
    * Per-group state stays ≤ k counters (the map-side combine ships ≤ k
    * entries per (partition, group)), so a billion-group fact table
    * costs k·|groups| state TOTAL where the exact one-pass groupBy
    * shuffles the full (group × item) cross — the n² blowup this sketch
    * family exists to avoid. Candidates are group-scoped: the recount
    * join is on (group, item), and thresholds use each group's own n. */
  def heavyHittersPerGroup(items: DataFrame, groupCol: Column,
      itemCol: Column, k: Int): DataFrame = {
    val mg = udaf(new MisraGries(k))
    // null group = "no group", null item = "no item" — dropped for the
    // same MapType/threshold reasons as the global form
    val its = items
      .select(groupCol.cast("string").as("grp"), itemCol.cast("string").as("tk"))
      .filter(col("grp").isNotNull && col("tk").isNotNull)
    val cand = its.groupBy(col("grp"))
      .agg(mg(col("tk")).as("sketch"), count(lit(1)).as("n_total"))
      .select(col("grp"), explode(map_keys(col("sketch"))).as("tk"),
        col("n_total"))
    // candidate side is ≤ k rows per group — broadcastable far past the
    // point the raw item stream is
    its.join(broadcast(cand), Seq("grp", "tk"))
      .groupBy(col("grp"), col("tk"), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select(col("grp"), col("tk"), col("cnt"))
  }
}
