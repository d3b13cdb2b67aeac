package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Portable

/** Property tests for the cross-engine primitives (SURVEY §5.2.3).
  * Plain ScalaCheck generators (no scalatestplus bridge in the offline
  * dependency set) driven over a fixed seed. */
class PortableSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("p60 is non-negative, < 2^60, and stable") {
    val strs = samples(Gen.alphaNumStr, 100).distinct
    val df = strs.toDF("s")
    val hs = df.select(Portable.p60(col("s")).as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    val hs2 = df.select(Portable.p60(col("s")).as("h")).as[Long].collect()
    assert(hs.toSeq == hs2.toSeq)
    assert(hs.distinct.length == strs.length) // no collisions on small sets
  }

  test("normText is idempotent and collapses whitespace") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\t")))
      .map(_.mkString)
    val inputs = samples(gen, 60)
    val df = inputs.toDF("t")
    val once = df.select(Portable.normText(col("t")).as("n")).as[String].collect()
    val twice = df.select(Portable.normText(Portable.normText(col("t"))).as("n")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
    assert(once.forall(s => !s.contains("  ") && !s.contains("\t")))
  }
}
