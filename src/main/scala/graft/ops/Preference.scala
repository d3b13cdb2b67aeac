package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the batch faces behind
  * preference-data pipelines (RLHF reward modeling turns "A beats B"
  * judgments into per-item strengths; annotation QA asks whether a
  * scalar strength is even a valid model of the judgments).
  *
  * Input convention for both entry points: a WINS frame with one row
  * per ordered pair — (winner, loser, n) exact-long counts, at most
  * |items|² rows. Building it from raw judgments is one hash
  * aggregate; q312 shows the events-derived construction.
  *
  * Determinism contract (the cross-engine discipline of
  * [[graft.ops.Stats]]): counts stay exact longs; the Bradley–Terry
  * MM rounds run as ONE vector-state expression fold on a single
  * bounded-width row — opponents fold in (a, b) order, items update
  * synchronously from the previous round's vector, the normalizer
  * folds in item order — so a SQL oracle can replay the identical
  * IEEE sequence (q312's recursive CTE does exactly that).
  *
  * Scale: nothing here touches data-sized frames. The wins matrix is
  * |items|²-bounded; the MM iteration is |items|+|items|² values on
  * one row; the cycle scan is a 3-way join on a |items|²-bounded
  * majority-edge frame. The only corpus-sized work is whatever
  * produced the wins counts (one aggregate).
  */
object Preference {

  /** Bradley–Terry strengths via `iters` rounds of the Hunter (2004)
    * MM update p_i ← w_i / Σ_j N_ij/(p_i+p_j), normalized to sum 1.
    * Returns (item, wins, games, strength, rnk) ordered by item;
    * strength is 6dp-rounded, rnk ranks strength DESC with item ASC
    * ties. Precondition: every item plays ≥ 1 game (an item absent
    * from `wins` on both sides simply doesn't appear). Items with
    * zero wins converge to strength ~0 — still valid output. */
  def bradleyTerry(wins: DataFrame, iters: Int = 25): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val w = wins.select(col("winner"), col("loser"), col("n").cast("long").as("n"))
      .localCheckpoint(true) // ≤ |items|² rows; read 3 ways below
    val games = w.select(col("winner").as("ga"), col("loser").as("gb"), col("n"))
      .unionByName(w.select(col("loser").as("ga"), col("winner").as("gb"),
        col("n")))
      .groupBy(col("ga"), col("gb")).agg(sum(col("n")).as("g"))
      .localCheckpoint(true) // directed pair matrix; read 2 ways
    val per = games.groupBy(col("ga").as("item"))
      .agg(sum(col("g")).as("games"))
      .join(w.groupBy(col("winner").as("item"))
        .agg(sum(col("n")).as("wins")), Seq("item"), "left")
      .na.fill(0L, Seq("wins"))
      .localCheckpoint(true) // |items| rows; folded + joined below
    val strengths = per
      .agg(array_sort(collect_list(struct(col("item"),
        col("wins").cast("double").as("w")))).as("st0"))
      .crossJoin(games.agg(array_sort(collect_list(struct(
        col("ga").as("a"), col("gb").as("b"),
        col("g").cast("double").as("n")))).as("gm")))
      .select(expr(
        s"""aggregate(sequence(1, $iters),
          |transform(st0, e -> named_struct(
          |  'item', e.item, 'w', e.w, 'p', cast(1.0 as double))),
          |(st, i) -> transform(st, e -> named_struct(
          |  'item', e.item, 'w', e.w,
          |  'p', e.w / aggregate(
          |    transform(filter(gm, g -> g.a = e.item),
          |      g -> g.n / (e.p +
          |        element_at(filter(st, x -> x.item = g.b), 1).p)),
          |    cast(0.0 as double), (acc, x) -> acc + x))))"""
          .stripMargin).as("st"))
      .select(col("st"), expr(
        """aggregate(transform(st, e -> e.p),
          |cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin)
        .as("z"))
      .select(explode(col("st")).as("u"), col("z"))
      .select(col("u.item").as("item"),
        round(col("u.p") / col("z"), 6).as("strength"))
    per.join(strengths, "item")
      .select(col("item"), col("wins"), col("games"), col("strength"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("strength").desc, col("item")))
        .cast("long")) // |items| rows: the single-task window is bounded
      .orderBy(col("item"))
  }

  /** Majority-direction transitivity audit — the validity check a
    * scalar strength model (Bradley–Terry, Elo) silently assumes: in
    * how many item triples do the pairwise MAJORITY directions form a
    * cycle (i beats j beats k beats i — rock-paper-scissors, which no
    * strength vector can represent)? Majority edges are strict
    * (n(i→j) > n(j→i); tied pairs drop, and a triple only counts when
    * all three of its pairs have a majority). Returns one row:
    * (n_items, n_majority_edges, n_triples, n_cycles, cycle_rate).
    * A triple's directions form a cycle iff neither orientation has a
    * "source" item beating both others — equivalently the 3 edge
    * directions are a rotation; tested directly via the two cyclic
    * patterns. */
  def cycleRate(wins: DataFrame): DataFrame = {
    val w = wins.select(col("winner"), col("loser"), col("n").cast("long").as("n"))
    val net = w.select(col("winner").as("a"), col("loser").as("b"), col("n"))
      .unionByName(w.select(col("loser").as("a"), col("winner").as("b"),
        lit(0L).as("n")))
      .groupBy(col("a"), col("b")).agg(sum(col("n")).as("nab"))
    // strict majority edges, one row per ORDERED winning pair
    val maj = net.as("x").join(net.as("y"),
        col("x.a") === col("y.b") && col("x.b") === col("y.a"), "left")
      .filter(col("x.nab") > coalesce(col("y.nab"), lit(0L)))
      .select(col("x.a").as("ma"), col("x.b").as("mb"))
      .localCheckpoint(true) // ≤ |items|²/2 rows; joined 3 ways
    val items = maj.select(col("ma").as("i"))
      .unionByName(maj.select(col("mb").as("i"))).distinct()
    // all i<j<k triples whose three pairs each carry a majority edge,
    // tagged with each edge's direction (bounded 3-way self-join);
    // each unordered pair contributes one canonical (lo, hi, lo-won?)
    // row whichever way its majority points
    val ij = maj.select(col("ma").as("i1"), col("mb").as("j1"),
      lit(true).as("iwj"))
      .unionByName(maj.select(col("mb").as("i1"), col("ma").as("j1"),
        lit(false).as("iwj")))
      .filter(col("i1") < col("j1"))
    val jk = maj.select(col("ma").as("j2"), col("mb").as("k2"),
      lit(true).as("jwk"))
      .unionByName(maj.select(col("mb").as("j2"), col("ma").as("k2"),
        lit(false).as("jwk")))
      .filter(col("j2") < col("k2"))
    val ik = maj.select(col("ma").as("i3"), col("mb").as("k3"),
      lit(true).as("iwk"))
      .unionByName(maj.select(col("mb").as("i3"), col("ma").as("k3"),
        lit(false).as("iwk")))
      .filter(col("i3") < col("k3"))
    val triples = ij
      .join(jk, col("j1") === col("j2"))
      .join(ik, col("i1") === col("i3") && col("k2") === col("k3"))
      .select(col("i1"), col("j1"), col("k2"), col("iwj"), col("jwk"),
        col("iwk"),
        // cyclic iff the three directions are a rotation: i→j→k→i
        // or its reverse i→k→j→i (with i<j<k canonical order)
        ((col("iwj") && col("jwk") && !col("iwk")) ||
          (!col("iwj") && !col("jwk") && col("iwk"))).as("cyc"))
    triples.agg(count(lit(1)).as("n_triples"),
        sum(when(col("cyc"), 1L).otherwise(0L)).as("n_cycles"))
      .crossJoin(broadcast(items.agg(count(lit(1)).as("n_items"))))
      .crossJoin(broadcast(maj.agg(count(lit(1)).as("n_majority_edges"))))
      .select(col("n_items"), col("n_majority_edges"), col("n_triples"),
        col("n_cycles"),
        when(col("n_triples") > 0,
          round(col("n_cycles").cast("double")
            / col("n_triples").cast("double"), 6)).as("cycle_rate"))
  }
}
