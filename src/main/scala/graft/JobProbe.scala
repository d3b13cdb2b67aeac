package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool (r22 optimization evidence): counts the SPARK JOBS one
  * `Dedup.connectedComponents` call submits over q298's real candidate
  * frame. The CC loop's driver-bound cost is its per-round job count
  * (the r21 scaling block: 8v32 ratios 0.28-0.78 across the iterative
  * family), so the r22 convergence-count fuse is graded in jobs per
  * round, which a plan dump cannot show. Prints total jobs, rounds
  * taken, and jobs outside the loop, so before/after trees give
  * comparable `jobs_per_round` lines.
  *
  * Usage: runMain graft.JobProbe [sfDir]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q298's exact candidate frame, materialized to a leaf so probe jobs
    // below count ONLY the CC call's own submissions
    val cand = graft.ops.Dedup.lshCandidates(
      graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingles(
          graft.queries.Tables(spark, sfDir, "documents"), maxShingleDf = 1000), 16), 4)
      .localCheckpoint(true)

    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // optional second arg: probe a REGISTERED query end-to-end instead
    // of the bare CC op (jobs + min-of-3 into the noop sink) — used for
    // q304's fold-seeding evidence, where the change lives in
    // mergeComponents, not in the plain connectedComponents path
    if (args.length > 1) {
      val qname = args(1)
      val fn = SparkEntry.queries(qname)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      Sessions.sweep(spark)
      var lastJobsQ = 0
      val timesQ = (1 to 3).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        lastJobsQ = jobs.get
        Sessions.sweep(spark)
        sec
      }
      println(f"query_job_probe: q=$qname cpus=$cpus sf=$sfDir " +
        f"jobs_per_call=$lastJobsQ min=${timesQ.min}%.2f " +
        f"runs=${timesQ.map(t => f"$t%.2f").mkString(",")}")
      spark.sparkContext.removeSparkListener(listener)
      spark.stop()
      sys.exit(0)
    }
    // untimed warmup (JIT), then min-of-3; the job count is read from
    // the LAST run alone (the counter resets per run)
    graft.ops.Dedup.connectedComponents(cand).count(): Unit
    var lastJobs = 0
    var rows = 0L
    val times = (1 to 3).map { _ =>
      jobs.set(0)
      val t0 = System.nanoTime()
      rows = graft.ops.Dedup.connectedComponents(cand).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus is async; drain before reading
      lastJobs = jobs.get
      sec
    }
    spark.sparkContext.removeSparkListener(listener)
    println(f"cc_job_probe: cpus=$cpus sf=$sfDir rows=$rows jobs_per_call=$lastJobs " +
      f"min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    println("  (jobs_per_call = loop jobs + broadcast jobs + 1 final count)")
    spark.stop()
  }
}
