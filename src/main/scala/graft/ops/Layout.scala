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

  /** Small-files compaction — the table-maintenance half of layout: a
    * streaming sink or per-batch append leaves a directory of
    * kilobyte-sized files whose open/footer overhead eventually
    * dominates every scan (the classic small-files problem; at 100 TB
    * the NameNode/listing cost alone is prohibitive). Rewrite `srcDir`
    * into `dstDir` as ⌈bytes/targetBytes⌉ files, optionally
    * range-sorted by `sortCols` so the rewritten files carry tight
    * min/max stats on the sort key (the zorder discipline, one
    * dimension). Returns (files_before, files_after, total_bytes).
    *
    * Writes to a NEW directory (copy-on-write — parquet has no
    * transactional overwrite; swap dirs at the catalog/symlink layer,
    * or version like the streaming state dirs). File sizing uses the
    * INPUT's compressed bytes as the estimate — output compression can
    * shift actual sizes; targetBytes is a target, not a bound. */
  def compactTo(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, targetBytes: Long,
      sortCols: Seq[Column] = Nil): (Long, Long, Long) = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(srcDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_")) buf += f.getLen
      }
      buf.toSeq
    }
    val totalBytes = files.sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(srcDir)
    val arranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
      else df.repartition(n)
    arranged.write.mode("overwrite").parquet(dstDir)
    val outFiles = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dstDir), true)
      var c = 0L
      while (it.hasNext) { if (!it.next().getPath.getName.startsWith("_")) c += 1 }
      c
    }
    (files.size.toLong, outFiles, totalBytes)
  }
}
