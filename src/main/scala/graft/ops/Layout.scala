package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side half of multi-dimensional data
  * skipping. [[graft.functions.ZOrder2]] supplies the key; this arranges
  * the frame so the writer emits files whose per-file min/max stats are
  * tight on BOTH dimensions (q106 audits the result; ZOrderSpec
  * demonstrates the pruning on a real parquet write).
  */
object Layout {
  /** The Morton key for two bucketed dimensions — the codegen
    * expression wrapped as a Column, no SQL registration needed. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ZOrder2(
        org.apache.spark.sql.GraftSqlBridge.expr(x),
        org.apache.spark.sql.GraftSqlBridge.expr(y), bits))

  /** The frame arranged for a z-ordered write: one range exchange on the
    * Morton key, rows sorted within each output partition, key dropped.
    * Follow with `.write.option("maxRecordsPerFile", n).parquet(path)` —
    * file size then bounds each file's z-run, i.e. its bounding box.
    * `numRanges` sizes the exchange (one writer task per range). */
  def zorder(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      numRanges: Int = 200): DataFrame = {
    // collision-free working column: a frame that already carries a
    // "_zkey" must not have it silently clobbered and dropped
    val zkey = Iterator.from(0).map(i => if (i == 0) "_zkey" else s"_zkey$i")
      .dropWhile(df.columns.contains).next()
    val keyed = df.withColumn(zkey, zorderKey(x, y, bits))
    keyed
      .repartitionByRange(numRanges, col(zkey))
      .sortWithinPartitions(col(zkey))
      .drop(zkey)
  }
}
