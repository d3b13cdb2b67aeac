package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r22): do the FIXED-round iteratives (BFS family, k-core)
  * actually converge before their registered depth on the real inputs?
  * If the last round is already a no-op, an accumulator-based early
  * exit (the CC-fuse machinery) would save jobs with bit-identical
  * output; if every round still changes state, there is no win to
  * claim and the idea is recorded as measured-and-rejected (guide
  * §1.2: measure before building).
  *
  * State monotonicity makes (count, sum) a sound no-change detector:
  * BFS dists and SPT (dist, pred) only ever shrink and keys are only
  * added; k-core edges are only removed. Equal (n, sum) between
  * consecutive depths ⇔ the extra round changed nothing.
  *
  * Usage: runMain graft.ConvergenceProbe [sfDir]
  */
object ConvergenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q158/q187's exact inputs (MLQueries coActivity/coEdges, cap 12)
    val activity = graft.queries.Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && graft.queries.Tables.propsItem.isNotNull)
      .select(concat_ws("|", graft.queries.Tables.propsItem,
        unix_micros(date_trunc("hour", col("ts")))).as("blk"),
        col("user_id").as("u"))
    val edges = graft.ops.Graph.coActivityEdges(activity, col("blk"), col("u"), 12)
      .localCheckpoint(true)
    val wedges = graft.ops.Graph
      .coActivityEdgesWeighted(activity, col("blk"), col("u"), 12)
      .localCheckpoint(true)
    val seeds = edges.select(col("u1").as("node"))
      .union(edges.select(col("u2").as("node")))
      .distinct().filter(col("node").isin(0, 1, 2))

    def sig(df: org.apache.spark.sql.DataFrame, sumCols: Seq[String]): (Long, Seq[Long]) = {
      val aggs = count(lit(1)).as("n") +: sumCols.map(c => sum(col(c)).as(c))
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      (r.getLong(0), sumCols.indices.map(i => r.getLong(i + 1)))
    }

    // q158: undirected hop BFS, registered maxHops = 3
    for (h <- 1 to 3) {
      val s = sig(graft.ops.Graph.bfsDistances(edges, seeds, maxHops = h),
        Seq("dist"))
      println(s"probe q158 bfs hops=$h n=${s._1} sum_dist=${s._2.head}")
    }
    // q187: directed weighted, registered maxHops = 3
    for (h <- 1 to 3) {
      val s = sig(graft.ops.Graph.bfsDistances(wedges, seeds, maxHops = h,
        directed = true, weightCol = Some("w")), Seq("dist"))
      println(s"probe q187 wbfs hops=$h n=${s._1} sum_dist=${s._2.head}")
    }
    // q200: SPT, registered maxHops = 3
    for (h <- 1 to 3) {
      val s = sig(graft.ops.Graph.shortestPathTree(wedges, seeds, maxHops = h,
        directed = true, weightCol = Some("w")), Seq("dist", "pred"))
      println(s"probe q200 spt hops=$h n=${s._1} sum_dist=${s._2(0)} sum_pred=${s._2(1)}")
    }
    // q144: kCore(k=3, maxRounds=4); q145 uses maxRounds=2
    for (r <- 1 to 4) {
      val s = sig(graft.ops.Graph.kCore(edges, k = 3, maxRounds = r),
        Seq("degree"))
      println(s"probe q144 kcore rounds=$r n=${s._1} sum_degree=${s._2.head}")
    }
    spark.stop()
  }
}
