package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query.
  *
  * `build` produces the Spark result over the parquet tables in `sfDir`;
  * `oracle` is the equivalent ANSI SQL the driver runs in DuckDB over the
  * same tables (None => driver records a weaker rows-only check).
  *
  * Contract notes (SURVEY.md §5.2):
  *  - column names must match between the two sides (the driver sorts
  *    columns by name before hashing);
  *  - output must be value-deterministic: every aggregate over doubles is
  *    rounded, every collect_list sorted, every result totally ordered.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Tables {
  import org.apache.spark.sql.functions._

  /** Load one driver-provided table (TESTDATA.md).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]); we read it as raw nanos via the legacy
    * flag and truncate to micros with exact integer division (ns values
    * ~1.7e18 exceed double's 2^53 exact range, so no float math here).
    * DuckDB reads the same column natively as TIMESTAMP_NS; second-level
    * truncation in query outputs keeps the two engines comparable.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** The parsed `events.props` payload: `{"k": <int>}`. One `from_json`
    * with an explicit schema (Jackson streaming, no JsonPath engine)
    * instead of per-key `get_json_object` — callers reuse the single
    * parsed struct however many fields they pull. */
  val propsItem: org.apache.spark.sql.Column =
    from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")
}

/** Scratch dirs for the queries whose point under test is a WRITE→READ
  * round trip (q117 CSV, q119 mergeSchema, q125 z-order): keyed on the
  * SANITIZED full dataset path — not its hashCode, which collides across
  * different paths and stays negative through math.abs at Int.MinValue —
  * so concurrent runs over different datasets never race overwrite-vs-
  * read on the same files, repeated runs over the same dataset reuse one
  * dir instead of accreting, and a JVM shutdown hook removes whatever
  * this run touched (bench can run twice back to back, no orphans). */
object Scratch {
  private val roots = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[java.io.File, java.lang.Boolean]())
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.forEach(deleteRecursively(_))))
    true
  }
  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
  def dir(prefix: String, datasetDir: String): String = {
    require(hookInstalled)
    val safe = new java.io.File(datasetDir).getAbsolutePath
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val f = new java.io.File(System.getProperty("java.io.tmpdir"), s"${prefix}_$safe")
    roots.add(f)
    f.getAbsolutePath
  }
}
