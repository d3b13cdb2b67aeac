package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage: blocked candidate scoring
  * (Fellegi–Sunter 1969) and one-to-one assignment.
  *
  * The three-stage ER pipeline this library exposes is
  * block ([[FuzzyJoin.blockedPairs]]) → score ([[fsScoredPairs]]) →
  * assign ([[reciprocalBest]]); q153/q323/q330 are the registered
  * faces. Assignment uses reciprocal best match — each record names
  * its argmax-scoring candidate partner and a pair survives iff the
  * choice is mutual — because it is the 1:1 resolution that
  * DISTRIBUTES: two hash-aggregate argmaxes and one self-join, all
  * map-side combinable. The optimal-assignment alternatives
  * (Hungarian, auction) are inherently sequential over the whole
  * score matrix and cannot run as a dataflow at corpus scale;
  * reciprocal-best is the standard large-scale compromise (it returns
  * a subset of any maximum-weight matching's quality but never links
  * one record to two masters, which is the invariant dedup-merge
  * consumers actually need).
  */
object Linkage {

  /** Fellegi–Sunter match weights over fingerprint-blocked candidate
    * pairs of `documents` rows (q323's scoring layer, shared with the
    * q330 assignment face). Each pair gets
    * Σ_f [agree_f ? ln(m_f/u_f) : ln((1−m_f)/(1−u_f))] over fields
    * independent of the block key (lang, length-bucket). The
    * u-probabilities are estimated from the data exactly —
    * u_f = Σ_v n_v² / N², exact longs up to the one division; the
    * m-probabilities are declared priors (0.95 lang, 0.9 bucket).
    * Block = the q33 rolling-min 8-gram fingerprint (codegen'd, one
    * pass) with the standard block purge at 50 (the FuzzyJoin.maxBlock
    * convention — LOAD-BEARING at sf0.1, max block 315). Returns
    * (doc_a < doc_b, agree_lang, agree_szb, cross_source, w) with `w`
    * the RAW double — callers decide (q323 reports w > 0; q330
    * assigns) on identical IEEE arithmetic both engines.
    *
    * Scale: pair volume is Σ_blk c² purged at 50; the u frame is
    * |values| rows broadcast; everything else is the equi-join. */
  def fsScoredPairs(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val nd = docs
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars DIV 100").as("szb"),
        Portable.normText(col("text")).as("nt"))
      .withColumn("blk", expr("p60_rolling8_min(nt)"))
      .drop("nt")
      .localCheckpoint(true) // feeds u-estimates, purge and pairing
    val ok = nd.groupBy(col("blk")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= 50).select(col("blk"))
    val kb = nd.join(ok, Seq("blk"), "left_semi")
    val n = nd.agg(count(lit(1)).as("n"))
    val ul = nd.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("s2l"))
    val us = nd.groupBy(col("szb")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("s2s"))
    val u = ul.crossJoin(us).crossJoin(n)
      .select(
        (col("s2l").cast("double") / (col("n") * col("n")).cast("double"))
          .as("u_lang"),
        (col("s2s").cast("double") / (col("n") * col("n")).cast("double"))
          .as("u_szb"))
    val a = kb.select(col("doc_id").as("doc_a"), col("blk"),
      col("lang").as("la"), col("szb").as("za"), col("source").as("ra"))
    val b = kb.select(col("doc_id").as("doc_b"), col("blk"),
      col("lang").as("lb"), col("szb").as("zb"), col("source").as("rb"))
    a.join(b, "blk").filter(col("doc_a") < col("doc_b"))
      .crossJoin(broadcast(u))
      .select(col("doc_a"), col("doc_b"),
        when(col("la") === col("lb"), 1L).otherwise(0L).as("agree_lang"),
        when(col("za") === col("zb"), 1L).otherwise(0L).as("agree_szb"),
        when(col("ra") =!= col("rb"), 1L).otherwise(0L).as("cross_source"),
        (when(col("la") === col("lb"), log(lit(0.95) / col("u_lang")))
          .otherwise(log(lit(0.05) / (lit(1d) - col("u_lang")))) +
          when(col("za") === col("zb"), log(lit(0.9) / col("u_szb")))
            .otherwise(log(lit(0.1) / (lit(1d) - col("u_szb")))))
          .as("w"))
  }

  /** Reciprocal-best one-to-one assignment over scored candidate pairs
    * (`aCol` < `bCol`, undirected). Each node's best partner is its
    * argmax by (score DESC, partner id ASC) — the id tiebreak is
    * LOAD-BEARING, not cosmetic: FS weights take only a handful of
    * distinct values (one per agreement pattern), so equal-score
    * candidates are the norm and an unordered argmax would be
    * nondeterministic. A pair survives iff each side is the other's
    * best. Returns (aCol, bCol, scoreCol) with aCol < bCol.
    *
    * Scale: symmetrize (a union, no shuffle), then ONE hash-aggregate
    * argmax per node — max of struct(score, −partner) is map-side
    * combinable and skew-immune where a per-node sort window is not
    * (the q105 GroupTopK argument, k = 1 case) — then one |nodes|-row
    * self-join on the mutual condition. */
  def reciprocalBest(pairs: DataFrame, aCol: String, bCol: String,
      scoreCol: String): DataFrame = {
    // materialize the (potentially expensive — q330 feeds the whole
    // blocked FS scoring in here) pair plan ONCE: a union-of-two-
    // selects symmetrize re-evaluates it per branch and the best-
    // frame self-join doubles that again (the connectedComponents
    // lesson; the plan audit caught this shape running the pair join
    // 4x). Explode duplicates each row map-side instead, and the
    // |nodes|-sized best frame is checkpointed before its self-join.
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"),
        col(scoreCol).as("sc"))
      .localCheckpoint(true)
    val sym = p.select(explode(array(
        struct(col("a").as("n"), col("b").as("p"), col("sc")),
        struct(col("b").as("n"), col("a").as("p"), col("sc")))).as("e"))
      .select(col("e.n").as("n"), col("e.p").as("p"), col("e.sc").as("sc"))
    val best = sym
      .groupBy(col("n"))
      .agg(max(struct(col("sc"), negate(col("p")).as("np"))).as("m"))
      .select(col("n"), negate(col("m.np")).as("p"), col("m.sc").as("sc"))
      .localCheckpoint(true) // |nodes| rows, read twice (self-join)
    best.as("x").join(best.as("y"),
        col("x.p") === col("y.n") && col("y.p") === col("x.n") &&
          col("x.n") < col("x.p"))
      .select(col("x.n").as(aCol), col("x.p").as(bCol),
        col("x.sc").as(scoreCol))
  }
}
