package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table reconciliation — "did the migration/backfill/replica produce
  * the same table?" answered without shuffling either full table.
  *
  * Two-phase shape (the datafold/data-diff pattern, re-expressed as
  * Catalyst aggregates):
  *
  *   1. [[bucketSummary]]: each side folds to `buckets` rows of
  *      (count, XOR of row-hashes). XOR is the right fold for content
  *      fingerprints: commutative/associative (partition-order
  *      independent, map-side combinable into ONE tiny shuffle of
  *      ≤buckets rows per side) and overflow-free (sum of hashes would
  *      trip ANSI arithmetic). Equal multisets of rows ⇒ equal
  *      (count, xor) per bucket; a mismatch pins WHICH key-range
  *      bucket disagrees.
  *   2. [[diffRows]]: only rows whose bucket disagrees are re-read and
  *      full-outer-joined on the key. On a 100 TB pair that mostly
  *      agrees, phase 2's join input is the few divergent buckets —
  *      the full-table row join never happens; the dominant cost
  *      stays the two phase-1 scans.
  *
  * Caveat (stated, not hidden): XOR fingerprints cancel under
  * even-multiplicity errors — a row duplicated twice on one side XORs
  * out. The per-bucket COUNT catches any cardinality change, so the
  * blind spot is an even number of swapped-in corrupt rows that also
  * preserves count; at 64-bit hash width that coincidence is the
  * standard accepted risk of every checksum-reconciliation scheme.
  */
object Reconcile {

  /** Internal working-column names, `__`-prefixed so they cannot
    * silently collide with user data: the first formulation used plain
    * "bucket", and a user table carrying its own `bucket` column had it
    * overwritten before the phase-2 row hash — changed rows differing
    * only in that column were never reported. [[guardColumns]] still
    * require()s against the residual pathological case of a user column
    * literally named `__reconcile_*`. */
  private val BucketCol = "__reconcile_bucket"
  private val LeftFp = "__reconcile_lfp"
  private val RightFp = "__reconcile_rfp"
  private val LeftN = "__reconcile_ln"
  private val RightN = "__reconcile_rn"

  private def guardColumns(df: DataFrame): Unit = {
    val clash = df.columns.filter(_.startsWith("__reconcile_"))
    require(clash.isEmpty,
      s"reconcile: input columns collide with internal names: ${clash.mkString(", ")}")
  }

  /** Row content hash over `cols` (xxhash64 — the 64-bit mixing hash,
    * null-discriminating: null and 0 hash differently). */
  private def rowHash(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** Phase 1: ≤`buckets` rows of (bucket, n, fp) for one side. Bucket
    * by the KEY hash (not the row hash) so a value-corrupted row lands
    * in the same bucket on both sides and surfaces as a fingerprint
    * mismatch there, not as two spurious one-sided buckets. */
  def bucketSummary(df: DataFrame, keyCols: Seq[String], buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    guardColumns(df)
    val valueCols = df.columns.toSeq.map(col)
    df.groupBy(pmod(xxhash64(keyCols.map(col): _*), lit(buckets)).as("bucket"))
      .agg(count(lit(1)).as("n"), bit_xor(rowHash(valueCols)).as("fp"))
  }

  /** Buckets whose (count, fingerprint) disagree — the phase-2 scope.
    * Full outer so a bucket present on only one side (all its keys
    * added/removed) is included. */
  /** Right side re-projected to the left's column ORDER (hash input
    * order matters) — schemas must carry the same column set. */
  private def aligned(left: DataFrame, right: DataFrame): DataFrame = {
    require(left.columns.toSet == right.columns.toSet,
      s"column sets differ: ${left.columns.toSeq} vs ${right.columns.toSeq}")
    right.select(left.columns.toSeq.map(col): _*)
  }

  def divergentBuckets(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], buckets: Int = 64): DataFrame = {
    val l = bucketSummary(left, keyCols, buckets)
      .withColumnsRenamed(Map("n" -> LeftN, "fp" -> LeftFp))
    val r = bucketSummary(aligned(left, right), keyCols, buckets)
      .withColumnsRenamed(Map("n" -> RightN, "fp" -> RightFp))
    l.join(r, Seq("bucket"), "full_outer")
      .filter(not(col(LeftN) <=> col(RightN)) || not(col(LeftFp) <=> col(RightFp)))
      .select(col("bucket"))
  }

  /** Phase 2: (key, status) for every differing row, where status ∈
    * {left_only, right_only, changed}. Both sides are first semi-joined
    * (broadcast — the bucket list is ≤`buckets` longs) to the divergent
    * buckets, so the row-level full-outer join shuffles only divergent
    * key ranges. Key columns must be non-null join keys; all other
    * columns are compared via the content hash. */
  def diffRows(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], buckets: Int = 64): DataFrame = {
    guardColumns(left)
    require(!keyCols.contains("status"),
      "reconcile: a key column named 'status' collides with the output column")
    val bad = divergentBuckets(left, right, keyCols, buckets)
      .withColumnRenamed("bucket", BucketCol)
    def scoped(df: DataFrame, fpName: String): DataFrame = {
      // the bucket lands in a __reconcile_* column, NEVER overwriting a
      // user column — the row hash below must cover every original column
      val b = df.withColumn(BucketCol,
        pmod(xxhash64(keyCols.map(col): _*), lit(buckets)))
      b.join(broadcast(bad), BucketCol)
        .select(keyCols.map(col) :+ rowHash(df.columns.toSeq.map(col)).as(fpName): _*)
    }
    scoped(left, LeftFp).join(scoped(aligned(left, right), RightFp), keyCols, "full_outer")
      .filter(not(col(LeftFp) <=> col(RightFp)))
      .select(keyCols.map(col) :+
        when(col(RightFp).isNull, lit("left_only"))
          .when(col(LeftFp).isNull, lit("right_only"))
          .otherwise(lit("changed")).as("status"): _*)
  }
}
