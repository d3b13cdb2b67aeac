package graft

import org.apache.spark.sql.functions._

/** q331 novelty-weighted data selection: the budget, the ordering, the
  * coverage columns and the score itself checked against a brute-force
  * recomputation from the raw shingle postings (bounded at sf0.001:
  * 500 docs). */
class SelectionSpec extends SparkSpec {

  test("q331 == brute-force rarity-mass top-k, coverage columns exact") {
    val docs = queries.Tables(spark, sf, "documents")
    val nDocs = docs.count()
    val k = math.max((nDocs / 20L).toInt, 1)
    val got = SparkEntry.queries("q331_novelty_selection")(spark, sf)
      .collect()
    assert(got.length == k)
    val nov = got.map(_.getAs[Long]("novelty"))
    assert(nov.sameElements(nov.sorted(Ordering[Long].reverse)))

    val sh = ops.Dedup.shingles(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dfm = sh.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val score = sh.groupBy(_._1).view
      .mapValues(_.map(p => nDocs - dfm(p._2)).sum).toMap
    val brute = score.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(k)
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == brute.map(_._1))
    assert(got.map(_.getAs[Long]("novelty")).toSeq == brute.map(_._2))

    val ids = brute.map(_._1).toSet
    val covered = sh.filter(p => ids.contains(p._1)).map(_._2)
      .distinct.length.toLong
    val total = sh.map(_._2).distinct.length.toLong
    assert(got.head.getAs[Long]("types_covered") == covered)
    assert(got.head.getAs[Long]("types_total") == total)
    // the selection must beat proportionality: 5% of docs carrying
    // well over 5% of types is the point of rarity weighting
    assert(covered.toDouble / total.toDouble > 0.05)
  }
}
