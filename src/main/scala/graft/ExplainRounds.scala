package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r21 optimization evidence): the iterative operators
  * (PageRank family, connected components) eagerly localCheckpoint every
  * round, so `graft.Explain` on the registered queries shows only the
  * final assembly over a materialized RDD — the PER-ROUND plan the r21
  * optimizations changed is invisible there. This main rebuilds ONE
  * round body over the real q134/q298 inputs in both shapes, with every
  * loop-invariant input materialized to a leaf (exactly how the loop
  * consumes them: the state frame is checkpointed each round, the edge
  * frame cached), and prints the formatted plans:
  *
  *  - `pagerank-round-r20`: out-degree joined into the loop twice per
  *    round (dangling anti-join + contribution inner join) — 4 joins
  *    per round;
  *  - `pagerank-round-r21`: degree carried in the rank state — the
  *    dangling mass is a joinless columnar aggregate, 2 joins per round
  *    (the unavoidable edge join + the final assembly join);
  *  - `cc-round-r20` / `cc-round-r21`: the same connected-components
  *    round body over an edge leaf that is unpartitioned (r20) vs
  *    hash-partitioned on the per-round join key b (r21) — the r21
  *    plan consumes the materialized layout where the r20 plan
  *    re-exchanges the edge side every round.
  *  - `cc-round-r22` + `cc-changed-count-r21`: the r22 shape fuses the
  *    convergence test into the checkpointed projection (the
  *    accumulator-bearing marker UDF) and narrows the state to
  *    (id, component); the separate `cc-changed-count-r21` plan is the
  *    per-round count JOB that fusion removed.
  *
  * NOTE (r21 ADVICE): the round bodies below are manual transcriptions
  * of `Graph.pageRank` / `Dedup.connectedComponents` round internals —
  * if those operators change, keep these in sync or the printed
  * "evidence" plans silently stop matching production code. The job
  * COUNTS (as opposed to plan shapes) are probed against the real
  * operators by [[graft.JobProbe]], which calls them directly.
  *
  * Usage: runMain graft.ExplainRounds [sfDir]
  */
object ExplainRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- PageRank round body, q134's edge frame ----
    val inter = graft.pipelines.MentionRecommender.interactions(
      graft.queries.Tables(spark, sfDir, "events"))
    val e = inter.select(
        concat(lit("u:"), col("user_id")).as("src"),
        concat(lit("i:"), col("item")).as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val n = nodes.count().toDouble
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg")).localCheckpoint(true)

    // r20 shape: ranks ⋈ outdeg twice per round (anti + inner)
    locally {
      val ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
      val dangling = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dsum"))
      val inbound = ranks.join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), (col("rank") / col("deg")).as("share"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_sum"))
      val next = nodes.join(inbound, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(0.15 / n) + lit(0.85) *
            (coalesce(col("in_sum"), lit(0.0)) + col("dsum") / n)).as("rank"))
      println("\n================= pagerank-round-r20 =================")
      next.explain("formatted")
    }

    // r21 shape: deg carried in the state; dangling is joinless
    locally {
      val base = nodes.join(outdeg, nodes("node") === outdeg("src"), "left")
        .select(col("node"), col("deg"))
        .repartition(col("node")).localCheckpoint(true)
      val ranks = base.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
      val dangling = ranks
        .agg(coalesce(sum(when(col("deg").isNull, col("rank"))), lit(0.0)).as("dsum"))
      val inbound = ranks.filter(col("deg").isNotNull)
        .select(col("node").as("src"), (col("rank") / col("deg")).as("share"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_sum"))
      val next = base.join(inbound, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("deg"),
          (lit(0.15 / n) + lit(0.85) *
            (coalesce(col("in_sum"), lit(0.0)) + col("dsum") / n)).as("rank"))
      println("\n================= pagerank-round-r21 =================")
      next.explain("formatted")
    }

    // ---- connected-components round body, q298's candidate pairs ----
    val pairs = graft.ops.Dedup.lshCandidates(
      graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingles(
          graft.queries.Tables(spark, sfDir, "documents"), maxShingleDf = 1000), 16), 4)
      .localCheckpoint(true)
    def ccRound(edges0: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      // cache (not checkpoint): the real loop caches its edge frame, and
      // InMemoryRelation PRESERVES outputPartitioning where localCheckpoint
      // degrades to UnknownPartitioning — the r21 claim is precisely that
      // the cached hash(b) layout satisfies the per-round join requirement
      val edges = edges0.cache()
      edges.count()
      val labels = edges.select(col("a").as("id")).distinct()
        .withColumn("component", col("id"))
        .localCheckpoint(true)
      val neighborMin = edges
        .join(labels.select(col("id"), col("component")), col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("component")).as("nbr_min"))
      val stepped = labels
        .join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
      val next = stepped
        .join(stepped.select(col("id").as("jid"), col("component").as("jcomp")),
          col("component") === col("jid"), "left")
        .select(col("id"), col("prev"),
          least(col("component"), coalesce(col("jcomp"), col("component"))).as("component"))
      println(s"\n================= cc-round-$tag =================")
      next.explain("formatted")
      edges.unpersist()
    }
    // the symmetrized pair frame as a materialized leaf, so the cached
    // edge frame's build plan under InMemoryRelation stays one line and
    // the per-round operators are readable
    val sym = pairs
      .select(explode(array(
        struct(col("d1").as("a"), col("d2").as("b")),
        struct(col("d2").as("a"), col("d1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .localCheckpoint(true)
    ccRound(sym, "r20")
    ccRound(sym.repartition(col("b")), "r21")

    // ---- r22: convergence count fused into the checkpoint job ----
    locally {
      val edges = sym.cache()
      edges.count()
      val labels = edges.select(col("a").as("id")).distinct()
        .withColumn("component", col("id"))
        .localCheckpoint(true)
      val neighborMin = edges
        .join(labels.select(col("id"), col("component")), col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("component")).as("nbr_min"))
      val stepped = labels
        .join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
      // the r21 shape materialized (id, prev, component) and then ran a
      // SECOND job per round over the checkpointed state:
      val nextR21 = stepped
        .join(stepped.select(col("id").as("jid"), col("component").as("jcomp")),
          col("component") === col("jid"), "left")
        .select(col("id"), col("prev"),
          least(col("component"), coalesce(col("jcomp"), col("component"))).as("component"))
        .localCheckpoint(true)
      println("\n================= cc-changed-count-r21 =================")
      nextR21.filter(col("component") < col("prev")).explain("formatted")
      // the r22 shape: the marker UDF records label shrinkage as a side
      // effect of the checkpoint materialization itself — no second job,
      // and `prev` never enters the checkpointed state
      val acc = spark.sparkContext.longAccumulator("graft.cc.changed")
      val mark = udf((c: java.lang.Long, p: java.lang.Long) => {
        if (c != null && p != null && c.longValue < p.longValue) acc.add(1L)
        c
      }).asNondeterministic()
      val nextR22 = stepped
        .join(stepped.select(col("id").as("jid"), col("component").as("jcomp")),
          col("component") === col("jid"), "left")
        .select(col("id"),
          mark(least(col("component"), coalesce(col("jcomp"), col("component"))),
            col("prev")).as("component"))
      println("\n================= cc-round-r22 =================")
      nextR22.explain("formatted")
      edges.unpersist()
    }

    // ---- r22: mergeComponents' seeded initialization (q304 folds) ----
    // fold k's prior state used to enter ONLY as star edges, paying a
    // full propagation round to collapse them; the r22 seed folds that
    // collapse into the init pass itself (fixpoint unchanged — labels
    // are min reachable ids under any valid start)
    locally {
      val prior = sym.select(col("a").as("id"), col("a").as("component")).distinct()
        .localCheckpoint(true) // stand-in prior state frame, node-sized
      val initUnseeded = sym.select(col("a").as("id")).distinct()
        .withColumn("component", col("id"))
      println("\n================= cc-init-unseeded-r21 =================")
      initUnseeded.explain("formatted")
      val initSeeded = sym.select(col("a").as("id")).distinct()
        .join(prior.select(col("id"), col("component").as("seed_c")), Seq("id"), "left")
        .select(col("id"), coalesce(col("seed_c"), col("id")).as("component"))
      println("\n================= cc-init-seeded-r22 =================")
      initSeeded.explain("formatted")
    }

    spark.stop()
  }
}
