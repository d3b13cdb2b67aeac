package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The r19 additions the DuckDB oracle can't independently derive:
  * the Winnow60 deque against the textbook two-stage definition (and
  * its clamped-tail edge cases), the winnowing shared-substring
  * guarantee, Theil–Sen against brute force, and the sign-flip test
  * against a from-scratch replicate replay. */
class WinnowTrendSpec extends SparkSpec {
  import graft.functions.TextHashOps

  /** Textbook winnowing: full hash array, then window minima with the
    * oracle's clamped list-slice semantics, then first-occurrence
    * distinct — the O(len·w) definition the deque must reproduce. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val u = UTF8String.fromString(s)
    val nH = math.max(u.numChars() - (k - 1), 1)
    val hs = (1 to nH).map(i =>
      graft.functions.Portable60.hash60(u.substringSQL(i, k)))
    val nWin = math.max(nH - (w - 1), 1)
    (1 to nWin).map(j => hs.slice(j - 1, math.min(j - 1 + w, nH)).min).distinct
  }

  test("winnow60 deque == two-stage textbook form on the real corpus") {
    val docs = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), ops.Portable.normText(col("text")).as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length > 10)
    for ((id, nt) <- docs; (k, w) <- Seq((16, 8), (8, 4))) {
      val got = TextHashOps.winnow60(UTF8String.fromString(nt), k, w)
        .toLongArray().toSeq
      assert(got == reference(nt, k, w), s"doc $id k=$k w=$w")
    }
  }

  test("winnow60 clamped-tail edge cases match the oracle slice") {
    // shorter than k: one hash of the whole string, one window
    // between k and k+w-1: full hash count, single clamped window
    // repeated text: ties collapse through distinct
    for (s <- Seq("ab", "abcdefgh", "abcdefghijklmnopqr", "aaaaaaaaaaaaaaaaaaaaaa");
         (k, w) <- Seq((16, 8), (8, 4), (3, 2))) {
      val got = TextHashOps.winnow60(UTF8String.fromString(s), k, w)
        .toLongArray().toSeq
      assert(got == reference(s, k, w), s"'$s' k=$k w=$w")
    }
  }

  test("winnowing guarantee: a shared >= k+w-1 run yields a shared fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog near the bank"
    val a = s"left context words here $shared and then some trailing text"
    val b = s"completely different opening $shared with another ending entirely"
    val k = 16; val w = 8
    require(shared.length >= k + w - 1)
    val fa = TextHashOps.winnow60(UTF8String.fromString(a), k, w).toLongArray().toSet
    val fb = TextHashOps.winnow60(UTF8String.fromString(b), k, w).toLongArray().toSet
    assert((fa & fb).nonEmpty)
  }

  test("q320 Theil-Sen == brute-force median of pairwise slopes") {
    val days = queries.Tables(spark, sf, "events")
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("x"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val slopes = (for {
      (xa, ya) <- days; (xb, yb) <- days if xb > xa
    } yield (yb - ya).toDouble / (xb - xa).toDouble).sorted
    def med(v: Seq[Double]) =
      if (v.length % 2 == 1) v(v.length / 2)
      else (v(v.length / 2 - 1) + v(v.length / 2)) / 2d
    val sen = med(slopes)
    val ic = med(days.map { case (x, y) => y.toDouble - sen * x.toDouble }
      .toSeq.sorted)
    val row = SparkEntry.queries("q320_theil_sen")(spark, sf).head
    assert(row.getAs[Long]("n_points") == days.length.toLong)
    assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
    assert(row.getAs[Double]("slope") ==
      BigDecimal(sen).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getAs[Double]("intercept") ==
      BigDecimal(ic).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q319 sign-flip replicates == from-scratch hash replay") {
    val diffs = queries.Tables(spark, sf, "events")
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("click", "view"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("cc"),
        sum(when(col("event_type") === "view",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("vc"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ncl"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"))
      .filter(col("ncl") > 0 && col("nv") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1) - r.getLong(2)))
    val obs = diffs.map(_._2).sum
    val stats = (0 until 256).map { r =>
      diffs.map { case (u, d) =>
        val h = graft.functions.Portable60.hash60(
          UTF8String.fromString(s"$u:$r"))
        if (h % 2 == 0) d else -d
      }.sum
    }
    val nExtreme = stats.count(s => math.abs(s) >= math.abs(obs)).toLong
    val row = SparkEntry.queries("q319_sign_flip_test")(spark, sf).head
    assert(row.getAs[Long]("n_units") == diffs.length.toLong)
    assert(row.getAs[Long]("stat_obs") == obs)
    assert(row.getAs[Long]("n_extreme") == nExtreme)
    assert(row.getAs[Double]("p_value") > 0d && row.getAs[Double]("p_value") <= 1d)
  }

  test("signFlipTest degenerate all-zero diffs -> p = 1") {
    import spark.implicits._
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("id", "d")
    val row = ops.Stats.signFlipTest(df, col("id"), col("d"), reps = 32).head
    assert(row.getAs[Long]("stat_obs") == 0L)
    assert(row.getAs[Long]("n_extreme") == 32L)
    assert(row.getAs[Double]("p_value") == 1.0)
  }
}
