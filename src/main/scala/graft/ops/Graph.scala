package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond [[Dedup.connectedComponents]]:
  * fixed-iteration PageRank (the canonical "importance over a directed
  * graph" measure — public algorithm, Brin & Page 1998) with proper
  * dangling-mass redistribution.
  *
  * Scale shape: every iteration is two node/edge-keyed shuffles — the
  * rank/out-degree join and the inbound-contribution aggregate (map-side
  * combined on the destination) — plus a SCALAR dangling-mass aggregate
  * (one row; the only driver-visible value besides the node count). The
  * ranks frame stays node-sized, edges edge-sized; nothing corpus-wide
  * ever sits on the driver. Lineage is flattened with localCheckpoint
  * every few rounds (the CC-loop discipline), so plan size and recompute
  * cost are constant per iteration.
  *
  * Fixed iteration count rather than convergence detection keeps runs
  * deterministic and oracle-replayable; production callers pick iters
  * by the usual ~log(N) guidance or wrap this in a delta check.
  */
object Graph {

  /** PageRank over directed edges (src, dst): returns (node, rank) for
    * every node appearing as source or destination. Parallel edges are
    * collapsed (simple-graph semantics). Dangling nodes (no out-edges)
    * redistribute their mass uniformly each iteration, so total rank
    * mass stays exactly 1 up to float addition. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // the graph's node count — a scalar, needed in the teleport term
    val n = nodes.count().toDouble
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var i = 1
    while (i <= iters) {
      // dangling mass: ranks of nodes with no out-edges (scalar agg)
      val dangling = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dsum"))
      // per-edge contribution rank(src)/deg(src), summed at the dst
      val inbound = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), (col("rank") / col("deg")).as("share"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_sum"))
      ranks = nodes.join(inbound, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("in_sum"), lit(0.0)) + col("dsum") / n)).as("rank"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint(eager = true)
      i += 1
    }
    ranks
  }
}
