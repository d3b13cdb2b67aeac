package graft

import org.apache.spark.sql.functions._

/** ops.Linkage — the assignment stage of the ER pipeline (q330): the
  * golden-case semantics of reciprocal best match (mutual argmax,
  * score DESC / partner id ASC tiebreak) and the structural contract
  * on the real corpus (a 1:1 matching inside the positive-weight
  * candidate set that agrees with the brute-force argmax). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("reciprocalBest: mutual argmax with id tiebreak, golden case") {
    // 1–2 mutual best; 3's best is 1 but 1 prefers 2 → 3 unmatched.
    // 4 ties between 5 and 6 at 0.5 → tiebreak picks the LOWER id 5;
    // 5's best is 4 → (4,5) matched, 6 left out.
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.8), (2L, 3L, 0.1),
      (4L, 5L, 0.5), (4L, 6L, 0.5), (5L, 6L, 0.2)
    ).toDF("a", "b", "w")
    val got = ops.Linkage.reciprocalBest(pairs, "a", "b", "w")
      .orderBy(col("a")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.9), (4L, 5L, 0.5)))
  }

  test("q330 is the mutual-argmax 1:1 matching of the positive candidates") {
    val pos = ops.Linkage
      .fsScoredPairs(queries.Tables(spark, sf, "documents"))
      .filter(col("w") > 0d)
      .select(col("doc_a"), col("doc_b"), col("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pos.nonEmpty)
    val got = SparkEntry.queries("q330_reciprocal_linkage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // matched pairs are candidates, and no node is linked twice
    val posSet = pos.map(p => (p._1, p._2)).toSet
    assert(got.forall(posSet.contains))
    val nodes = got.flatMap(m => Seq(m._1, m._2))
    assert(nodes.distinct.length == nodes.length)
    // brute-force per-node argmax by (w DESC, partner ASC) — the match
    // set must be exactly the mutual pairs of that map
    val best = pos
      .flatMap(p => Seq((p._1, (p._3, p._2)), (p._2, (p._3, p._1))))
      .groupBy(_._1).map { case (n, cs) =>
        n -> cs.map(_._2).minBy { case (w, p) => (-w, p) }._2
      }
    assert(got.forall(m => best(m._1) == m._2 && best(m._2) == m._1))
    val mutual = best.count { case (n, p) => best.get(p).contains(n) && n < p }
    assert(mutual == got.length)
    // the mutual filter drops real candidates here (non-vacuity)
    assert(got.length < pos.length)
  }
}
