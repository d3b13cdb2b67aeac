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

  /** Row content hash over `cols` (xxhash64 — the 64-bit mixing hash,
    * null-discriminating: null and 0 hash differently). */
  private def rowHash(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** Phase 1: ≤`buckets` rows of (bucket, n, fp) for one side. Bucket
    * by the KEY hash (not the row hash) so a value-corrupted row lands
    * in the same bucket on both sides and surfaces as a fingerprint
    * mismatch there, not as two spurious one-sided buckets. */
  def bucketSummary(df: DataFrame, keyCols: Seq[String], buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
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
      .withColumnsRenamed(Map("n" -> "ln", "fp" -> "lfp"))
    val r = bucketSummary(aligned(left, right), keyCols, buckets)
      .withColumnsRenamed(Map("n" -> "rn", "fp" -> "rfp"))
    l.join(r, Seq("bucket"), "full_outer")
      .filter(not(col("ln") <=> col("rn")) || not(col("lfp") <=> col("rfp")))
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
    val bad = divergentBuckets(left, right, keyCols, buckets)
    def scoped(df: DataFrame, fpName: String): DataFrame = {
      val b = df.withColumn("bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(buckets)))
      b.join(broadcast(bad), "bucket")
        .select(keyCols.map(col) :+ rowHash(df.columns.toSeq.map(col)).as(fpName): _*)
    }
    scoped(left, "lfp").join(scoped(aligned(left, right), "rfp"), keyCols, "full_outer")
      .filter(not(col("lfp") <=> col("rfp")))
      .select(keyCols.map(col) :+
        when(col("rfp").isNull, lit("left_only"))
          .when(col("lfp").isNull, lit("right_only"))
          .otherwise(lit("changed")).as("status"): _*)
  }
}
