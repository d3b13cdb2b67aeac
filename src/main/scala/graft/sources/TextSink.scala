package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}

/** S4/S5 parity sink (SURVEY §2.1): the reference persists both workload
  * outputs with `saveAsTextFile` (COMP5349_2.py:188,211) — one line per
  * record, the record's string rendering, written partition-parallel.
  * The structured parquet sink (graft.Verify) is the real output path;
  * this is the line-oriented twin for consumers of the reference's file
  * shape.
  */
object TextSink {

  /** Write `df` as text, one `Row.toString` line per row (the JVM analog
    * of the reference's Python-tuple lines). Distributed: each partition
    * writes its own part file, exactly like saveAsTextFile. */
  def saveAsText(df: DataFrame, path: String): Unit =
    df.map(_.toString())(Encoders.STRING)
      .write.mode("overwrite").text(path)

  /** Re-read a text sink: one `value: string` column, line per record. */
  def readText(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
