package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r22, VERDICT item 5): time `Dedup.connectedComponents` over
  * q298's real candidate frame under a configurable MASTER and
  * `spark.graft.round.partitions` setting — the knob's target regime is
  * multi-process widths (`local-cluster[n,c,m]`), which the in-process
  * bench can't reach, so this main is invoked once per (master, knob)
  * configuration and prints a min-of-3 timing line.
  *
  * Env:
  *  - SPARK_GRAFT_PROBE_MASTER  (default local[8])
  *  - SPARK_GRAFT_PROBE_ROUND_PARTITIONS (unset = knob off)
  *  - SPARK_GRAFT_PROBE_SHUFFLE_PARTITIONS (default 8)
  *
  * Usage: runMain graft.CCKnobProbe [sfDir]
  */
object CCKnobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val master = sys.env.getOrElse("SPARK_GRAFT_PROBE_MASTER", "local[8]")
    val sp = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE_PARTITIONS", "8")
    val knob = sys.env.get("SPARK_GRAFT_PROBE_ROUND_PARTITIONS")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-cluster executors are separate JVMs launched without sbt's
      // classpath; hand them the driver's (all-local paths)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    knob.foreach(v => spark.conf.set(graft.ops.Rounds.PartitionsKey, v))

    val cand = graft.ops.Dedup.lshCandidates(
      graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingles(
          graft.queries.Tables(spark, sfDir, "documents"), maxShingleDf = 1000), 16), 4)
      .localCheckpoint(true)
    // one untimed warmup (JIT), then min-of-3
    graft.ops.Dedup.connectedComponents(cand)
      .write.format("noop").mode("overwrite").save()
    // NO Sessions.sweep between runs: it drops ALL persistent RDD blocks
    // including the reused `cand` checkpoint leaf; the CC loop already
    // unpersists its own edge cache and its superseded per-round label
    // frames are tiny
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.ops.Dedup.connectedComponents(cand)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"cc_knob_probe: master=$master knob=${knob.getOrElse("unset")} " +
      f"sf=$sfDir min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
