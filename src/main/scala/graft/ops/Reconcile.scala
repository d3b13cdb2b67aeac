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

  /** CDC rows from two snapshots — the missing middle between
    * [[diffRows]] (WHICH keys changed) and the Incremental delta face
    * (how to CONSUME changes): emits one row per change with the full
    * row payload and a signed weight, update = retraction of the old
    * row + insertion of the new, so the output feeds
    * [[graft.ops.Incremental.partialDelta]] directly (weight column as
    * the delta weight) and replaying it on top of `prev`'s state yields
    * `curr`'s state (pinned in ReconcileSpec). `op` ∈ {insert, delete,
    * update_del, update_ins}; unchanged keys emit nothing.
    *
    * Scale shape: phase-1 bucket scoping exactly as [[diffRows]] — both
    * snapshots are semi-joined to the broadcast divergent-bucket list
    * before the row-level full-outer join, so two 100 TB snapshots that
    * mostly agree never join in full; the dominant cost stays the two
    * summary scans. Keys must be non-null; `weight` and `op` are
    * reserved output names (guarded). */
  def cdcRows(prev: DataFrame, curr: DataFrame, keyCols: Seq[String],
      buckets: Int = 64): DataFrame = {
    guardColumns(prev)
    val reserved = Seq("op", "weight").filter(prev.columns.contains)
    require(reserved.isEmpty,
      s"reconcile: snapshot columns collide with CDC output names: ${reserved.mkString(", ")}")
    val bad = divergentBuckets(prev, curr, keyCols, buckets)
      .withColumnRenamed("bucket", BucketCol)
    def scoped(df: DataFrame, side: String): DataFrame =
      df.withColumn(BucketCol, pmod(xxhash64(keyCols.map(col): _*), lit(buckets)))
        .join(broadcast(bad), BucketCol)
        .select(keyCols.map(col) :+
          struct(df.columns.toSeq.map(col): _*).as(side): _*)
    val l = scoped(prev, LeftFp)
    val r = scoped(aligned(prev, curr), RightFp)
    val valueNames = prev.columns.toSeq.filterNot(keyCols.contains)
    val delRow = struct(lit("delete").as("op"), lit(-1L).as("weight"),
      col(LeftFp).as("row"))
    val insRow = struct(lit("insert").as("op"), lit(1L).as("weight"),
      col(RightFp).as("row"))
    val updDel = struct(lit("update_del").as("op"), lit(-1L).as("weight"),
      col(LeftFp).as("row"))
    val updIns = struct(lit("update_ins").as("op"), lit(1L).as("weight"),
      col(RightFp).as("row"))
    // unchanged keys (possible inside a divergent bucket) fall through
    // every when() to NULL, which explode drops — no otherwise branch.
    // The change test is EXACT struct comparison, not a hash: the
    // fingerprint collision risk phase 1 accepts for its summaries has
    // no reason to exist at row level where both payloads are present.
    l.join(r, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        explode(
          when(col(RightFp).isNull, array(delRow))
            .when(col(LeftFp).isNull, array(insRow))
            .when(not(col(LeftFp) <=> col(RightFp)),
              array(updDel, updIns))).as("c"): _*)
      .select(keyCols.map(col) ++ Seq(col("c.op"), col("c.weight")) ++
        valueNames.map(n => col("c.row").getField(n).as(n)): _*)
  }
}
