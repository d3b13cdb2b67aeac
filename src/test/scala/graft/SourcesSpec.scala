package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Source/sink coverage beyond parquet: CSV and JSONL round trips with
  * explicit schemas, and partition-pruned reads of a partitioned layout
  * (the write shape a 100 TB ingest would use). */
class SourcesSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")

  test("CSV round trip with explicit schema preserves data") {
    val dir = Files.createTempDirectory("csv_rt").toString + "/out"
    val src = events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    assert(back.count() == src.count())
    val s1 = src.agg(round(sum(col("value")), 4)).head().getDouble(0)
    val s2 = back.agg(round(sum(col("value")), 4)).head().getDouble(0)
    assert(s1 == s2)
  }

  test("JSONL round trip (the splittable alternative to multiline JSON)") {
    val dir = Files.createTempDirectory("jsonl_rt").toString + "/out"
    val src = events.select(col("event_id"), col("user_id"), col("props"))
    src.write.json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == src.count())
    assert(back.select(sum(col("event_id"))).head().getLong(0) ==
      src.select(sum(col("event_id"))).head().getLong(0))
  }

  test("ORC round trip preserves data and pushes filters") {
    val dir = Files.createTempDirectory("orc_rt").toString + "/out"
    events.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == events.count())
    val filtered = back.filter(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type)"), plan.take(600))
    assert(filtered.count() == events.filter(col("event_type") === "purchase").count())
  }

  test("S4/S5 text sink parity: one Row.toString line per record") {
    val dir = Files.createTempDirectory("text_sink").toString + "/out"
    val src = events.select(col("event_id"), col("event_type")).limit(100)
    graft.sources.TextSink.saveAsText(src, dir)
    val back = graft.sources.TextSink.readText(spark, dir)
    assert(back.count() == 100)
    // the reference's saveAsTextFile line shape: the record's string
    // rendering, bracketed, comma-joined (COMP5349_2.py:188,211)
    val line = back.head().getString(0)
    assert(line.startsWith("[") && line.endsWith("]") && line.contains(","), line)
  }

  test("partitioned parquet: filters become PartitionFilters (pruned scan)") {
    val dir = Files.createTempDirectory("part_pq").toString + "/out"
    events.write.partitionBy("event_type").parquet(dir)
    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    // structural: the predicate must land in the scan node's
    // partitionFilters, robust to plan-string format changes
    val scans = clicks.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty &&
      scans.head.partitionFilters.exists(_.references.exists(_.name == "event_type")),
      clicks.queryExecution.executedPlan.toString.take(800))
    assert(clicks.count() ==
      events.filter(col("event_type") === "click").count())
  }
}
