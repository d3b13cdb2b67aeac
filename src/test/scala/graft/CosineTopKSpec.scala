package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The declarative CosineTopKPlan node + RewriteCosineTopK rule
  * (SURVEY §7.5(c)): the optimizer must pick the exact face below the
  * size threshold and the sign-LSH face above it, and each face must be
  * row-for-row identical to the direct library call it replaces (the
  * q40/q42 hash-stability contract). */
class CosineTopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val prepared = Similarity.prepare(
    queries.Tables(spark, sf, "embeddings")).cache()

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("qid"), col("nid"), col("cos_sim"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("rewrite picks the EXACT face when the corpus fits the threshold") {
    val auto = Similarity.cosineTopKAuto(prepared, col("id") < 5, k = 3,
      exactMaxBytes = Long.MaxValue)
    // plan shape: no sign_lsh bucketing anywhere, and the node itself is
    // gone (rewritten before planning)
    val plan = optimized(auto)
    assert(!plan.contains("sign_lsh"), s"exact face must not bucket:\n$plan")
    assert(!plan.contains("CosineTopKPlan"), "node must be rewritten away")
    assert(rows(auto) == rows(
      Similarity.cosineTopK(prepared, col("id") < 5, k = 3)))
  }

  test("rewrite picks the LSH face when the corpus exceeds the threshold") {
    val auto = Similarity.cosineTopKAuto(prepared, col("id") < 5, k = 3,
      planes = 4, exactMaxBytes = 0L)
    val plan = optimized(auto)
    assert(plan.contains("sign_lsh"), s"LSH face must bucket:\n$plan")
    assert(!plan.contains("CosineTopKPlan"), "node must be rewritten away")
    assert(rows(auto) == rows(
      Similarity.annTopK(prepared, col("id") < 5, k = 3, planes = 4)))
  }

  test("default threshold keeps a dev-scale corpus exact") {
    // sf0.001 embeddings are a few hundred KB — far under the 256 MB
    // default, so the auto face with no pinned threshold must be exact
    val auto = Similarity.cosineTopKAuto(prepared, col("id") < 5, k = 3)
    assert(!optimized(auto).contains("sign_lsh"))
    assert(rows(auto) == rows(
      Similarity.cosineTopK(prepared, col("id") < 5, k = 3)))
  }

  test("downstream operators compose over the node's output attributes") {
    // references above the node (select/orderBy/filter on qid/rn) must
    // survive the rewrite's re-aliasing onto the original exprIds
    val n = Similarity.cosineTopKAuto(prepared, col("id") < 5, k = 3,
      exactMaxBytes = Long.MaxValue)
      .filter(col("rn") === 1)
      .select(col("qid"), col("nid"))
      .orderBy(col("qid"))
      .count()
    assert(n == prepared.filter(col("id") < 5).count())
  }
}
